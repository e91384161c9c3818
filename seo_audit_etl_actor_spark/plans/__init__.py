"""Physical-plan introspection and assertions (SURVEY §4): the engine's
scale claims — pushdown, pruning, broadcast joins, whole-stage codegen, no
Python UDFs on hot paths — as machine-checkable predicates used in tests."""
