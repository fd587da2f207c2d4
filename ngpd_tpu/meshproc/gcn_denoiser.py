"""The full GCN-denoiser flow — MeshViewer::slotDenoise rebuilt.

The C++ app's pipeline (MeshViewer.cpp:769-1416):
  1. build 64-face patches for every face (OpenMP + FLANN,
     PatchData.cpp) -> here one batched extract_mesh_patches call;
  2. run the TorchScript DGCNN on CUDA in 720-face batches
     (MeshViewer.cpp:802-890) -> jitted Flax DGCNN, batched;
  3. normalize + rotate predictions back to world frame
     (MeshViewer.cpp:893-911) -> unrotate_predictions;
  4. guided bilateral normal filtering + vertex updates
     (MeshNormalFiltering.cpp) -> guided_normal_filter;
  5. optionally a SECOND GCN pass on the denoised mesh with rebuilt
     neighborhoods (MeshViewer.cpp:1073-1336) -> passes > 1. The app
     loads a DISTINCT second network for that pass
     (script_model_2.pt, MeshViewer.cpp:787-798) trained on
     first-pass outputs — ``variables2`` here.

``bucketed=True`` pads the mesh to power-of-two shape buckets
(meshproc.bucketing) so meshes of similar size share one compiled
program — the difference between O(#meshes) and O(#buckets) XLA
compiles over a corpus.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import GNFConfig, PatchConfig
from ..models.dgcnn import DGCNN
from .bucketing import pad_mesh
from .filtering import guided_normal_filter
from .patches import extract_mesh_patches, unrotate_predictions
from .trimesh import TriMesh


@partial(jax.jit, static_argnums=0)
def _fwd(model, variables, x):
    # Module-level jit (model is a hashable frozen flax Module) so the
    # DGCNN forward compiles ONCE per batch shape for the whole process
    # — a per-call inner jit recompiled on every pass of every mesh.
    return model.apply(variables, x, train=False)


def predict_face_normals(
    mesh: TriMesh,
    model: DGCNN,
    variables,
    patch_cfg: PatchConfig = PatchConfig(),
    batch_size: int = 720,
    pmesh=None,
    axis: str = "points",
    pre_nbh=None,
) -> jnp.ndarray:
    """Per-face world-frame normals from the patch network.

    batch_size=720 matches the app's inference batching
    (MeshViewer.cpp:806). With ``pmesh`` (a jax.sharding.Mesh), the
    patch batch is dp-sharded over ``axis`` instead and runs as ONE
    SPMD forward — the app's 720-face loop is a CUDA-memory artifact;
    per-face inference is embarrassingly parallel, so on a TPU mesh
    each chip takes nf/d faces (parity vs the loop is checked by
    __graft_entry__.dryrun_multichip and tests/test_meshproc.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    patches = extract_mesh_patches(mesh, cfg=patch_cfg, pre_nbh=pre_nbh)
    nf = patches.inputs.shape[0]

    if pmesh is not None:
        d = pmesh.shape[axis]
        pad = -nf % (d * 8)  # sublane-friendly per-shard batch
        x = jnp.pad(patches.inputs, ((0, pad), (0, 0), (0, 0)))
        x = jax.device_put(x, NamedSharding(pmesh, P(axis, None, None)))
        pred = _fwd(model, variables, x)[:nf]
    else:
        outs = []
        for s in range(0, nf, batch_size):
            e = min(s + batch_size, nf)
            chunk = patches.inputs[s:e]
            pad = batch_size - (e - s)
            if pad:
                chunk = jnp.pad(chunk, ((0, pad), (0, 0), (0, 0)))
            outs.append(_fwd(model, variables, chunk)[: e - s])
        pred = jnp.concatenate(outs, axis=0)
    pred = pred / jnp.maximum(
        jnp.linalg.norm(pred, axis=1, keepdims=True), 1e-12
    )
    return unrotate_predictions(pred, patches.rotations)


def gcn_denoise_mesh(
    mesh: TriMesh,
    model: DGCNN,
    variables,
    passes: int = 1,
    gnf_cfg: GNFConfig = GNFConfig(),
    patch_cfg: PatchConfig = PatchConfig(),
    batch_size: int = 720,
    variables2=None,
    bucketed: bool = False,
    pmesh=None,
    gnf_cfg2: Optional[GNFConfig] = None,
) -> TriMesh:
    """GCN-predicted normals -> guided filtering, optionally iterated
    with rebuilt neighborhoods (the app's box_gcns knob,
    GCNDenoiser.cpp:25-33).

    ``variables2``: weights for every pass after the first — the
    cascade's second-stage network trained on first-pass outputs
    (script_model_2.pt, MeshViewer.cpp:787-798). Defaults to
    ``variables`` (single-model iteration).

    ``gnf_cfg2``: filter knobs for every pass after the first. The
    second pass starts from near-clean geometry with residual feature
    blur, so re-running the full first-pass iteration budget
    over-smooths it; a shorter, gentler pass preserves what pass 1
    already converged (docs/GOLDEN.md cascade table). Defaults to
    ``gnf_cfg`` (the reference app reuses its constants on every pass,
    MeshNormalFiltering.cpp:29-40).

    ``pmesh``: dp-shard the patch inference over a device mesh (see
    predict_face_normals) — the flagship pipeline's scale-out knob.
    """
    face_mask: Optional[jnp.ndarray] = None
    if bucketed:
        padded = pad_mesh(mesh)
        out: TriMesh = padded.mesh
        face_mask = padded.face_mask
    else:
        out = mesh
    from ..ops.knn import knn
    from .trimesh import face_normals_areas_centroids

    for p in range(max(1, passes)):
        pass_vars = variables if p == 0 or variables2 is None else variables2
        # One centroid-kNN build per pass, shared by patch extraction
        # and the guided filter (both consume the same k=64 index; the
        # kNN is the pipeline's most expensive op — ~4.8 s of a 30 s
        # cascade at 82k faces before sharing). Only when the two
        # consumers agree on k.
        pre_nbh = None
        if patch_cfg.num_nodes == 64:
            _, _, centroids = face_normals_areas_centroids(out.v, out.f)
            nbh, d2 = knn(centroids, patch_cfg.num_nodes)
            pre_nbh = (nbh.idx, nbh.mask, d2)
        guidance = predict_face_normals(
            out, model, pass_vars, patch_cfg, batch_size, pmesh=pmesh,
            pre_nbh=pre_nbh,
        )
        if face_mask is not None:
            # Sentinel faces guide with their own normals; their
            # neighborhoods never touch real faces, so this only keeps
            # their rows numerically tame.
            own, _, _ = out.face_data()
            guidance = jnp.where(face_mask[:, None], guidance, own)
        pass_cfg = gnf_cfg if p == 0 or gnf_cfg2 is None else gnf_cfg2
        out = guided_normal_filter(
            out, guidance, pass_cfg, face_mask=face_mask, pre_nbh=pre_nbh
        )
    if bucketed:
        return mesh.with_vertices(out.v[: mesh.num_vertices])
    return out
