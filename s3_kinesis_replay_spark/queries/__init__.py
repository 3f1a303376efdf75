"""Declared query modules — one per SURVEY.md §2 family group.

Importing a module registers its queries (see registry.register).
"""
