"""Workflow models — the L5 layer of the reference (SURVEY.md §1):
tree isolation, skeletonization, QSM generation, canopy metrics, cluster
joining, segmentation. Each is a host-orchestrated pipeline of jitted kernels
over the columnar scene state."""
