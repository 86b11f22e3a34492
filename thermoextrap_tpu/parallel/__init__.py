"""Multi-device sharding: mesh helpers and sharded moment reduction."""
