"""Device-side ops: noise kernels, camera, geometry, march, post-processing."""
