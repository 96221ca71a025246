"""Multi-device parallelism: meshes, camera-DP, pixel-sharded rendering."""
