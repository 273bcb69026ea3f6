"""Spatial partitioning of the conv trunk (the SP/CP analogue).

MNC has no attention, so sequence/context parallelism does not apply; the
closest TPU-native analogue the survey prescribes (SURVEY.md §2.3 "optional
spatial partitioning of the conv trunk for very large images — stretch") is
sharding the IMAGE HEIGHT over the mesh and letting XLA's SPMD partitioner
insert the conv halo exchanges automatically: no manual ppermute, no manual
overlap bookkeeping — the sharding annotations ARE the program.

Use when a single image is too large for one chip's HBM (gigapixel tiles,
pathology slides): each chip holds H/n rows of the image and of every
activation; 3×3 convs exchange 1-row halos over ICI, pools are local.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mnc_tpu.models.mnc import MNC


def spatial_trunk_features(model: MNC, mesh: Mesh, axis: str = "data"):
    """Build a jitted fn computing trunk features with H sharded over ``axis``.

    Returns ``fn(params, image)`` where image is (H, W, 3); BOTH H and the
    feature height H/feat_stride must be divisible by ``mesh.shape[axis]``
    (i.e. H % (n·16) == 0); the output feature map (H/16, W/16, C)
    comes back sharded the same way (keep it sharded for a downstream
    spatially-sharded consumer, or ``jax.device_get`` to gather).
    """
    img_sh = NamedSharding(mesh, P(axis, None, None))
    rep = NamedSharding(mesh, P())

    def features(params, image):
        return model.apply(params, image, method=MNC.features)

    return jax.jit(features, in_shardings=(rep, img_sh), out_shardings=img_sh)


def shard_image(image, mesh: Mesh, axis: str = "data"):
    """Place one (H, W, 3) image height-sharded on the mesh."""
    return jax.device_put(image, NamedSharding(mesh, P(axis, None, None)))
