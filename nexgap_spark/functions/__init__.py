"""Document ops: pure, deterministic Python cores (XML tool-call extraction,
validators, prompt cleanup, format emitters) wrapped as Arrow-batched pandas
UDFs. These are the only places reference semantics live outside Spark SQL
(SURVEY §7)."""
