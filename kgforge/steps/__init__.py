"""Ray Data pipeline stages (SURVEY §2). Every stage is a pure function
``Dataset -> Dataset``; stateful stages are callable classes run as actor
pools via ``map_batches(Cls, concurrency=...)``. No ``ray.init`` here."""
