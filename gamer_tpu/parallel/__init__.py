"""Mesh sharding for multi-chip rendering."""

from .sharding import (  # noqa: F401
    make_pixel_mesh,
    render_scene_sharded,
    sharded_render_fn,
)
