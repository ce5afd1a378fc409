"""Catalyst-planned (relational) forms of the SURVEY.md §2 operator
inventory, plus the training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Every SQL-expressible operator here has a DuckDB oracle twin in
``registry.ORACLE_SQL`` with byte-identical column aliases; the driver
compares row-count + schema + order-insensitive value hash at sf0.01.
"""
