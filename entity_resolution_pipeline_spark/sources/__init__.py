"""Sources/sinks: synthetic web-pages generator, parquet-backed catalog,
testdata loaders."""
