"""LLM-data-pipeline extensions (SURVEY.md §2.12 / BASELINE.json north star):
deduplication, similarity search, text analysis, multimodal column plumbing.
All built on native Spark primitives; Python appears only in clearly-marked
Pandas-UDF kernels.
"""
