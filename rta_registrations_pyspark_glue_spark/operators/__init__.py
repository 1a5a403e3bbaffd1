"""Operator library — each reference operation (SURVEY.md §2) as a pure
``DataFrame -> DataFrame`` transform, plus the large-scale training-data
operators (dedup, similarity search, text analysis, multimodal plumbing).
"""
