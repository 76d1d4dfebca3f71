"""CBAS-TPU: a TPU-native framework for automated animal-behavior phenotyping from video.

A ground-up rebuild of the capabilities of jones-lab-tamu/CBAS (reference at
/root/reference) designed TPU-first:

- frame encoding runs as a batched JAX/XLA program (DINOv2/DINOv3 ViT in pure JAX,
  flash-attention Pallas kernels for the patch encoder),
- the LSTM behavior-classification head is a scan-based JAX sequence model,
- training/inference are jit-compiled device programs sharded over a
  ``jax.sharding.Mesh`` (batch-dim data parallelism over ICI),
- the host runtime (video decode, HDF5 streaming, worker scheduling) feeds the
  device asynchronously.

Artifact formats (HDF5 embedding files, ``*_outputs.csv`` probability tables,
YAML configs and model bundles) are kept compatible with the reference so
projects can move between the two.
"""

__version__ = "0.1.0"

from cbas_tpu.core.project import (  # noqa: F401
    Project,
    Recording,
    Dataset,
    Model,
    InvalidProject,
)
