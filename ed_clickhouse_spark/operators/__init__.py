"""Engine operators: compositions of DataFrame primitives for semantics
Spark lacks natively (as-of join, funnel, sessionize, dedup families,
similarity search)."""
