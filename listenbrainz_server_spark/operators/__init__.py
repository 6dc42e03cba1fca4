"""Reusable DataFrame operator library.

Each module re-expresses one family from the reference's operator
inventory (SURVEY.md §2) as composable, Catalyst-friendly DataFrame
transformations. No Python UDFs in the hot path.
"""
