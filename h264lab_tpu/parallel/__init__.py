"""Device-mesh sharding: GOP parallelism over hosts, slice bands over chips."""
