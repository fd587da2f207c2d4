#!/usr/bin/env python
"""Headline benchmark: classical denoise throughput on one TPU chip.

Workload from BASELINE.json's north star: a 1M-point cloud, neighbor
k = 32, 20 denoise iterations, target < 1 s on a single v5e chip —
i.e. >= 20M point-iterations/second. The full pipeline runs per
iteration: voxel-grid kNN rebuild, two filtered-NVT eigendecompositions,
VU normal smoothing, classification, and the class-dispatched vertex
updates.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
value = point-iterations per second; vs_baseline = value / 20e6
(>1 means the <1 s target is beaten).
"""

import json
import os
import sys
import time

import numpy as np


def make_cloud(n: int, seed: int = 0):
    """A piecewise-planar "CAD roof" surface: triangle waves in x and y
    give planar facets meeting in sharp crease lines — the geometry the
    feature-preserving denoiser is FOR. (A smooth sine surface is the
    wrong quality workload: the iteration converges toward piecewise
    planarity, so >~5 iterations over-smooth it and CD rises again.)
    Surface-like density keeps the voxel grid representative. Returns
    (noisy, normals, clean); normals are the analytic facet normals so
    the gate scores the denoiser, not the estimator."""
    rng = np.random.default_rng(seed)
    side = int(np.sqrt(n))
    # Domain scales with sqrt(n): constant point spacing (0.01) at any
    # N, so the noise/spacing regime — and the quality gate — is
    # comparable across bench scales.
    xs = np.linspace(0.0, 10.0 * side / 1000.0, side, dtype=np.float32)
    xx, yy = np.meshgrid(xs, xs, indexing="ij")
    p, amp = 2.5, 0.5

    def tri(t):
        return 2 * np.abs(t / p - np.floor(t / p + 0.5))

    def dtri(t):
        return np.sign(((t / p + 0.5) % 1.0) - 0.5) * 2 / p

    zz = amp * (tri(xx) + tri(yy))
    pts = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3).astype(np.float32)
    gx = amp * dtri(xx).ravel()
    gy = amp * dtri(yy).ravel()
    extra = n - len(pts)
    if extra > 0:
        sel = rng.integers(0, len(pts), extra)
        pts = np.concatenate([pts, pts[sel]])
        gx = np.concatenate([gx, gx[sel]])
        gy = np.concatenate([gy, gy[sel]])
    normals = np.stack([-gx, -gy, np.ones_like(gx)], axis=-1)
    normals = (
        normals / np.linalg.norm(normals, axis=1, keepdims=True)
    ).astype(np.float32)
    noise = rng.normal(scale=0.02, size=(len(pts), 1)).astype(np.float32)
    clean = pts
    return (pts + normals * noise).astype(np.float32), normals, clean


def _tpu_backend_alive(attempts: int = 3) -> bool:
    """Probe the axon TPU backend in a subprocess with a hard timeout.

    When the remote TPU tunnel is down, backend init HANGS (it does not
    error), which would wedge the bench forever — probe out-of-process
    and fall back to the CPU smoke path instead. Retries with growing
    timeouts: a transient tunnel blip should not demote a round's perf
    record to a CPU smoke number."""
    import subprocess

    code = (
        "import jax; d = jax.devices();"
        "print('OK' if d and d[0].platform != 'cpu' else 'CPU')"
    )
    for i in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True,
                timeout=180.0 + 120.0 * i,
                env=dict(os.environ),
            )
            if proc.returncode == 0 and "OK" in proc.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(
            f"bench: TPU probe attempt {i + 1}/{attempts} failed",
            file=sys.stderr,
        )
        if i + 1 < attempts:
            time.sleep(30)
    return False


def _last_known_good_tpu():
    """Most recent committed TPU result from BENCH_r*.json, so a CPU
    fallback line is self-describing: a reader of the JSON alone sees
    which round's TPU number still stands as the perf record."""
    import glob
    import re

    best = None
    here = os.path.dirname(os.path.abspath(__file__))
    for p in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            rec = json.load(open(p))
            parsed = rec.get("parsed") or {}
            if "tpu" in parsed.get("metric", ""):
                m = re.search(r"BENCH_r(\d+)", p)
                best = {"round": int(m.group(1)) if m else None, **parsed}
        except Exception:
            continue
    return best


def run_mesh_bench(platform: str) -> dict:
    """Flagship mesh pipeline throughput: the full two-pass GCN cascade
    (patch extraction -> DGCNN guidance -> guided normal filtering ->
    vertex updates, then a second pass with the distinct stage-2
    network) on a golden-scale synthetic mesh, with the committed
    checkpoints. This is the reference app's interactive workload
    (MeshViewer.cpp:769-1416, batch-720 loop at :802-890) measured as
    faces/second end-to-end.

    Returns a dict for embedding in the bench JSON line. A quality gate
    guards the number: the cascade must cut the mean angular error to
    <= 35% of the noisy mesh's, or the result reports "fail"."""
    import jax
    import jax.numpy as jnp

    from ngpd_tpu.config import GNFConfig
    from ngpd_tpu.learn.weights import load_dgcnn_npz
    from ngpd_tpu.meshproc.gcn_denoiser import gcn_denoise_mesh
    from ngpd_tpu.meshproc.metrics import mean_angular_error
    from ngpd_tpu.meshproc.synthetic import icosphere
    from ngpd_tpu.meshproc.trimesh import add_mesh_noise
    from ngpd_tpu.models.dgcnn import dgcnn_from_variables

    here = os.path.dirname(os.path.abspath(__file__))
    variables = load_dgcnn_npz(os.path.join(here, "assets/dgcnn_mesh.npz"))
    variables2 = load_dgcnn_npz(
        os.path.join(here, "assets/dgcnn_mesh_2.npz")
    )
    model = dgcnn_from_variables(variables)

    # Golden-scale on the chip (nicolo is 99,994 faces); a small smoke
    # mesh on CPU fallback runs.
    subdiv = int(os.environ.get(
        "NGPD_BENCH_MESH_SUBDIV", 6 if platform != "cpu" else 4
    ))
    clean = icosphere(subdiv=subdiv, radius=0.6)
    noisy = add_mesh_noise(clean, jax.random.PRNGKey(0), 0.3)
    nf = int(clean.num_faces)

    # The deployment default recipe: tuned pass-1 knobs + the gentle
    # second pass with the distinct stage-2 checkpoint (docs/GOLDEN.md).
    gentle2 = GNFConfig(normal_iterations=4, sigma_r=0.12,
                        vertex_iterations=2)
    # batch 2048 instead of the app's 720: per-face inference is
    # embarrassingly parallel and 2048x20x64 fits VMEM/HBM easily; the
    # 720 constant is a CUDA-memory artifact of the reference.
    batch = int(os.environ.get("NGPD_BENCH_MESH_BATCH", 2048))
    run = lambda: gcn_denoise_mesh(  # noqa: E731
        noisy, model, variables, passes=2, gnf_cfg=GNFConfig(),
        variables2=variables2, gnf_cfg2=gentle2, batch_size=batch,
    )

    out = run()
    float(jnp.sum(out.v))  # sync (see sync() note in main)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = run()
        float(jnp.sum(out.v))
        best = min(best, time.perf_counter() - t0)

    ea_noisy = float(mean_angular_error(noisy, clean))
    ea_out = float(mean_angular_error(out, clean))
    ratio = ea_out / max(ea_noisy, 1e-30)
    gate = "pass" if ratio <= 0.35 else "fail"
    return {
        "metric": f"mesh cascade ({nf} faces, 2-pass GCN+GNF, {platform})",
        "value": round(nf / best, 1),
        "unit": "faces/s",
        "seconds": round(best, 3),
        "quality_gate": gate,
        "quality_ea_noisy_deg": round(ea_noisy, 2),
        "quality_ea_denoised_deg": round(ea_out, 2),
    }


def main():
    from ngpd_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    backend = "tpu"
    if not _tpu_backend_alive():
        # The sitecustomize pins jax_platforms, so the env var alone is
        # not enough — override the config before first backend use.
        print(
            "bench: TPU backend unavailable (probe timed out) — "
            "falling back to the CPU smoke path",
            file=sys.stderr,
        )
        import jax as _jax

        os.environ["JAX_PLATFORMS"] = "cpu"
        _jax.config.update("jax_platforms", "cpu")
        backend = "cpu-fallback"
    import jax
    import jax.numpy as jnp

    if "--mesh" in sys.argv:
        # Standalone mesh-cascade bench: one JSON line, mesh metric only.
        rec = run_mesh_bench(jax.devices()[0].platform)
        rec["backend"] = backend
        print(json.dumps(rec))
        sys.exit(1 if rec.get("quality_gate") == "fail" else 0)

    from ngpd_tpu.config import DenoiseConfig
    from ngpd_tpu.core.fused import fused_denoise
    from ngpd_tpu.core.pallas_fused import pallas_denoise_hybrid

    platform = jax.devices()[0].platform
    default_n = 1_000_000 if platform != "cpu" else 20_000
    n = int(os.environ.get("NGPD_BENCH_N", default_n))
    iters = int(os.environ.get("NGPD_BENCH_ITERS", 20))
    k = int(os.environ.get("NGPD_BENCH_K", 32))

    pts_np, nrm_np, clean_np = make_cloud(n)
    pts = jnp.asarray(pts_np)
    nrm = jnp.asarray(nrm_np)

    cfg = DenoiseConfig(feature_k=k, step_k=8)
    if platform == "cpu":
        # Pallas interpret mode is too slow for a bench; use the XLA
        # fused engine on CPU smoke runs.
        run = lambda: fused_denoise(
            pts, nrm, cfg, iterations=iters,
            tile=512, window=128, group=16,
            threshold_method="approx", threshold_refresh=0,
        )
    else:
        # Hybrid Pallas engine: window reductions in VMEM kernels,
        # per-point math (eigh/VU/solves) as full-width XLA fusions;
        # stale-threshold + lagged-delta semantics mirror the
        # reference's frozen KD-tree (Selector.py:141). lagged_nvt1
        # reuses K2's filtered-NVT rows as the next iteration's K1
        # (one window kernel per iteration instead of two); the
        # quality gate below scores the benched configuration.
        lagged = os.environ.get("NGPD_BENCH_LAGGED_NVT1", "1") != "0"
        run = lambda: pallas_denoise_hybrid(
            pts, nrm, cfg, iterations=iters, tile=256, window=128,
            lagged_nvt1=lagged,
        )

    import jax.numpy as _jnp

    def sync(o):
        # block_until_ready does not reliably synchronize through remote
        # device tunnels; a scalar host transfer does.
        return float(_jnp.sum(o))

    # Warm-up compile.
    out, _, _ = run()
    sync(out)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out, _, _ = run()
        sync(out)
        best = min(best, time.perf_counter() - t0)

    # Quality gate at the benched settings: speed must not silently cost
    # accuracy. The synthetic cloud has a known clean surface, so score
    # the CD improvement on a subsample (full 1M x 1M CD is O(N^2)).
    from ngpd_tpu.ops import metrics as _metrics

    q = min(n, 20_000)
    sel = np.random.default_rng(1).choice(n, size=q, replace=False)
    clean_s = jnp.asarray(clean_np[sel])
    cd_noisy = float(
        jnp.mean(_metrics.chamfer_distance(clean_s, jnp.asarray(pts_np[sel])))
    )
    out_np = np.asarray(out)
    cd_out = float(
        jnp.mean(_metrics.chamfer_distance(clean_s, jnp.asarray(out_np[sel])))
    )
    ratio = cd_out / max(cd_noisy, 1e-30)

    value = n * iters / best
    target = 20e6  # 1M pts x 20 iters in 1 s
    # Quality gate: the benched engine must cut CD to <= GATE_RATIO of
    # the noisy input or the bench FAILS (nonzero exit + "fail" in the
    # JSON line) — a throughput win that stops denoising cannot look
    # green in BENCH_r*.json.
    GATE_RATIO = 0.25
    gate = "pass" if ratio <= GATE_RATIO else "fail"
    line = {
        "metric": f"denoise throughput ({n} pts, k={k}, {iters} iters, {platform})",
        "value": round(value, 1),
        "unit": "point-iterations/s",
        "vs_baseline": round(value / target, 4),
        "backend": backend,
        "quality_gate": gate,
        "quality_cd_ratio": round(ratio, 4),
        "quality_cd_noisy": round(cd_noisy, 8),
        "quality_cd_denoised": round(cd_out, 8),
    }
    if backend == "cpu-fallback":
        lkg = _last_known_good_tpu()
        if lkg:
            # The CPU number is a smoke check, not the perf record —
            # carry the standing TPU record alongside it.
            line["last_known_good_tpu"] = lkg
    # Second driver-visible metric: the flagship mesh cascade, embedded
    # in the same single JSON line. Guarded so a mesh-path failure can
    # never cost the point-engine perf record.
    if os.environ.get("NGPD_BENCH_MESH", "1") != "0":
        try:
            line["mesh_pipeline"] = run_mesh_bench(platform)
        except Exception as e:  # pragma: no cover - defensive
            line["mesh_pipeline"] = {"error": repr(e)[:200]}
    print(json.dumps(line))
    if gate == "fail":
        # A regression in the fast engine shows up here long before it
        # shows up in the throughput number.
        print(
            f"FAIL: quality gate ratio {ratio:.3f} > {GATE_RATIO} — the "
            "benched engine is not actually denoising at these settings",
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
