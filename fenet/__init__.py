"""fenet — a TPU-native (JAX/XLA/Pallas) single-image -> 3D point-cloud
reconstruction framework.

A ground-up rebuild of the capabilities of the CUDA/PyTorch reference
``sunhui-3D/3D-PointCloudReconstruction`` ("3D-FENet"), redesigned for TPU:

- ``fenet.ops``       Pallas/XLA metric kernels (Chamfer, auction-EMD, FPS)
                      replacing the ``metric/chamfer3D`` and ``metric/emd``
                      CUDA extensions.
- ``fenet.models``    Flax RepVGG(+SE) encoder, Sobel edge branch and the
                      cascaded point decoder, with structural
                      reparameterization as a pure weight transform.
- ``fenet.losses``    Chamfer/EMD/F-score/projection loss facade.
- ``fenet.geometry``  Differentiable projection, ICP (on device), camera math.
- ``fenet.data``      ShapeNet/Pix3D loaders with a double-buffered host->HBM
                      pipeline, augmentations, FPS data prep.
- ``fenet.train``     Training loop (Adam + reference LR/loss schedules),
                      checkpoint/resume, metric logging.
- ``fenet.eval``      Batched on-device ShapeNet / Pix3D evaluation.
- ``fenet.parallel``  Mesh construction + data-parallel sharding (pjit).
"""

__version__ = "0.1.0"
