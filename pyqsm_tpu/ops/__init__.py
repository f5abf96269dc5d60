"""TPU-native compute kernels.

Every capability the reference delegates to CPU C++ libraries (SURVEY.md §2b)
is implemented here as jitted JAX / Pallas code over padded fixed-shape
arrays:

- ``neighbors``  — kNN / radius search (replaces Open3D KDTreeFlann + scipy cKDTree)
- ``sampling``   — voxel / uniform / farthest-point downsampling (+trace)
- ``outliers``   — statistical outlier removal
- ``normals``    — covariance normal estimation + orientation
- ``cluster``    — DBSCAN, connected components, k-means (replaces Open3D/sklearn)
- ``ransac``     — batched circle / cylinder RANSAC (replaces pyransac3d)
- ``sparse``     — ELL sparse matvec + preconditioned CG (replaces SuperLU spsolve)
- ``graph``      — Borůvka MST + degree-2 chain contraction (replaces mistree/networkx)
- ``features``   — covariance eigenfeatures + kNN smoothing (replaces jakteristics)
- ``geometry``   — percentile crops, rotations, grids, hulls (math_utils parity)
- ``color``      — RGB/HSV segmentation math (viz/color.py parity)
- ``raytrace``   — brute Möller–Trumbore oracle + ray generators
- ``grid3d``     — uniform-grid DDA acceleration for arbitrary ray bundles
- ``raygrid``    — cell-aligned sun + screen-space pinhole casting
- ``voxelmesh``  — device surface reconstruction (density + marching tets)
"""

from pyqsm_tpu.ops import neighbors, sampling, outliers, normals  # noqa: F401
