"""Custom operators Spark lacks natively, built as compositions of
DataFrame ops (preferred) or Arrow-batched Pandas UDFs (scale paths).
"""
