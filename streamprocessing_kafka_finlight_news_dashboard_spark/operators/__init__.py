"""Reusable DataFrame transforms (the engine's operator library).

Each module groups one operator family from SURVEY.md §2 plus the
beyond-reference LLM-data-pipeline operators (dedup, similarity,
text analysis, multimodal plumbing). Everything is a pure
DataFrame -> DataFrame function so plans compose lazily and Catalyst
sees the whole tree.
"""
