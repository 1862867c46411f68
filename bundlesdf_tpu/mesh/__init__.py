"""Mesh extraction, repair and I/O (replaces the reference's skimage
marching-cubes + trimesh stack, neither of which is available here)."""
from bundlesdf_tpu.mesh.core import Mesh
from bundlesdf_tpu.mesh.marching import marching_tetrahedra
