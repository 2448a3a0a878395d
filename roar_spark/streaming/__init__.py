"""Streaming engine: envelope parsing, stream registry, bounded retention,
TTL expiry, serving facade, and the persistence sink — the Spark-native
re-expression of the reference's consumer/manager/flight/sink stack."""
