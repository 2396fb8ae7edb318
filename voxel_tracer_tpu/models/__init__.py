"""Scene-side model components: camera, voxel volumes, .vox loading,
scenes, lights and the skydome."""
