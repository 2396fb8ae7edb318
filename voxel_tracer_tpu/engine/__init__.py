"""Engine services: physics world, collision (GJK/SAT), object pools.

Analog of src/engine/ — host-side simulation feeding the renderer's
per-frame transforms (the reference keeps PhyWorld dormant, renderer.h:83-86;
here it is a working optional module driving volume poses).
"""
