"""Structured Streaming surface (SURVEY §2.9).

The reference is single-shot batch — streaming is engine surface beyond it:
the batch expressions from queries/relational.py re-bound to readStream
sources with watermarks, session windows, and a custom stateful operator
(applyInPandasWithState)."""
