"""Distribution layer: device meshes, sharded distributed bundle adjustment."""
