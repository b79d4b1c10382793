"""Composable DataFrame→DataFrame transforms (SURVEY.md §2 inventory).

Every transform works identically on batch DataFrames and inside a
streaming micro-batch — that symmetry is what makes the DuckDB oracle
applicable to the same code paths the streaming shell runs.
"""
