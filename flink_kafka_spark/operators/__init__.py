"""Reusable DataFrame -> DataFrame operator building blocks.

One module per capability family from SURVEY.md §2. Every operator is a
plain function over DataFrames so the batch and streaming paths share
code (streaming callers add ``withWatermark`` before invoking).
"""
