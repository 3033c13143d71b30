"""DataFrame-native operators: as-of dedup, deduplication families,
similarity search. All designed for multi-executor scale — map-side
combinable aggregations, broadcastable small sides, no driver collects
in the hot path."""
