"""Sources: archive staging/listing + batch and streaming readers (SURVEY §2.A)."""
