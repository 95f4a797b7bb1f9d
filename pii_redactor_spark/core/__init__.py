"""Pure-Python semantic core (no Spark imports).

These functions define the *row-level semantics* of the engine — entity
classification, boundary adjustment, span splicing, language ID, quality
scoring. They are unit-tested standalone and invoked from Arrow-batched
pandas UDFs in ``pii_redactor_spark.operators``. Keeping them Spark-free is
what makes byte-equality between the distributed pipeline and the
row-at-a-time oracle (``core.reference_impl``) a meaningful differential test.
"""
