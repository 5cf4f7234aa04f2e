"""Shared constants for the bundled pure-Python protobuf runtime shim.

The sandbox has no pip-installed protobuf, which the
transformWithStateInPandas tier needs (its state client speaks
protobuf to the JVM's state server). The container's Google Cloud SDK
bundles a pure-Python runtime one minor behind PySpark's gencode;
protobuf's own escape hatch covers the skew. TWO consumers apply the
shim and must never drift apart:

- tests/conftest.py — BEFORE the first SparkSession launches (module
  scope), so the whole suite, workers included, inherits it via the
  JVM environment;
- streaming/stateful.ensure_protobuf_runtime — AFTER launch, for a
  vanilla session that already exists (the driver's flow): sys.path
  for the driver, ``sc.environment`` for workers.

This module deliberately imports nothing (no pyspark, no protobuf) so
either consumer can import it at any point in its bootstrap.
"""

SDK_PROTOBUF_PATH = "/usr/lib/google-cloud-sdk/platform/google_appengine"
VERSION_CHECK_ESCAPE_ENV = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"
