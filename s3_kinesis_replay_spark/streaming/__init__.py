"""Streaming subsystem: replay pipeline (source→sink), stateful operators."""
