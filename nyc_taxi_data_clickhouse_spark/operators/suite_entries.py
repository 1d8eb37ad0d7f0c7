"""Suite registrations for the extension operators.

Importing this module registers every extension operator's
(spark, oracle) pair into ``suite._REGISTRY``.  Kept separate from the
operator implementations so the operators stay importable without the
testdata-binding glue.
"""

# Modules with @register-decorated suite entries are imported here as
# they are implemented (dedup, similarity, text, multimodal, streaming).
