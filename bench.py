"""North-star benchmark record for the driver.

Prints ONE JSON line whose headline metric is ALS training time per
iteration at last.fm-360k scale, f=128 (reference: 0.389 s/iter on an
NVIDIA A6000, implicit's CUDA build — BASELINE.md). The same line carries
an ``extras`` object with the rest of the BASELINE.md north stars:

  - ALS s/iter at factors 64 / 128 / 256 (bf16 production mode) and the
    f32 mode at 128, each with its own A6000 vs_baseline ratio
    (/root/reference/benchmarks/README.md:29-36)
  - BPR and LMF seconds/epoch at the same scale (no published reference
    numbers exist — reported for trend tracking)
  - batched `recommend` serving throughput (users/s) at 160k items with
    already-liked filtering
  - end-to-end ALS p@10 on a clustered synthetic set (quality gate; the
    structural analogue of the reference's ML-100k p@10 > 0.2 test,
    /root/reference/tests/evaluation_test.py:103-119 — real datasets can't
    be downloaded in this zero-egress environment)

The synthetic interaction matrix matches last.fm-360k's shape statistics
(360k users x 160k items, ~17M nonzeros, power-law item popularity); ALS
iteration cost depends only on these statistics, not the cell values.

vs_baseline > 1 means faster than the reference GPU build.
"""

import json
import os
import signal
import sys
import time

import numpy as np

# per-stage watchdog: a hung remote compile service (observed mid-round-3:
# the chip executes cached programs fine while fresh compiles block for many
# minutes) should cost one stage, not the whole record. Best-effort: SIGALRM
# only preempts the main thread between bytecodes, so it relies on the
# blocking call (compile RPC / transfer) releasing the GIL — PJRT does.
STAGE_TIMEOUT = int(os.environ.get("BENCH_STAGE_TIMEOUT", "600"))
# global ceiling sized WELL inside any plausible driver budget (round 4's
# record was lost to a driver kill at an unknown timeout with the old 3h
# ceiling; a healthy full run takes ~25min). Once the deadline passes, the
# remaining stages record "skipped" rows and the record still prints — and
# the record is also re-printed after EVERY stage (last line wins for the
# parser), so even a kill mid-stage loses only that stage.
GLOBAL_DEADLINE = int(os.environ.get("BENCH_GLOBAL_DEADLINE", "2400"))
# a fresh-program compile slower than this marks the compile service
# degraded: cold-compile stages (cold fit, pow2 grid) are skipped outright
DEGRADED_COMPILE_S = float(os.environ.get("BENCH_DEGRADED_COMPILE_S", "60"))


class _StageTimeout(Exception):
    pass


def _stage_guard(fn, seconds):
    def handler(signum, frame):
        raise _StageTimeout()

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    try:
        return fn()
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _row(value, baseline=None, digits=4):
    """Extras row; a None value records an explicit stage failure."""
    if value is None:
        return {"value": None, "note": "stage timed out or failed"}
    row = {"value": round(value) if digits == 0 else round(value, digits)}
    if baseline is not None:
        row["vs_baseline"] = round(baseline / value, 3)
    return row

USERS = 360_000
ITEMS = 160_000
NNZ = 17_500_000

# MovieLens-20M shape after the reference benchmark's 4+ star filter
# (/root/reference/benchmarks/README.md:65-66): 138k x 27k, ~12M nonzeros
ML20M_USERS = 138_000
ML20M_ITEMS = 27_000
ML20M_NNZ = 12_000_000

# reference CUDA on A6000, /root/reference/benchmarks/README.md:29-36,51-58
A6000_S_PER_ITER = {64: 0.446, 128: 0.389, 192: 0.513, 256: 0.631}
A6000_ML20M_S_PER_ITER = {64: 0.328, 128: 0.227, 192: 0.265, 256: 0.300}
HEADLINE_FACTORS = 128


def _sync(x):
    """Fetch a scalar to the host: forces completion of all enqueued work
    (block_until_ready alone is unreliable over remote transports)."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


def bench_als(Cui, user_buckets, item_buckets, factors, compute_dtype, iters=5,
              gather_quant=False):
    """Best-of-3 seconds per ALS iteration at the given factor count."""
    import jax.numpy as jnp

    from implicit_tpu.ops import als as als_ops

    rng = np.random.default_rng(42)
    X0 = jnp.asarray(rng.random((Cui.shape[0], factors), dtype=np.float32) * 0.01)
    Y0 = jnp.asarray(rng.random((Cui.shape[1], factors), dtype=np.float32) * 0.01)
    _sync(X0), _sync(Y0)

    def run():
        X = X0 + 0.0  # device-side copies: init/upload isn't an iteration
        Y = Y0 + 0.0
        _sync(X)
        t0 = time.time()
        X, Y = als_ops.fit(
            X, Y, user_buckets, item_buckets, 0.01, iterations=iters,
            compute_dtype=compute_dtype, gather_quant=gather_quant,
        )
        _sync(X)
        return (time.time() - t0) / iters

    run()  # warmup / compile
    return min(run() for _ in range(3))


def bench_cold_fit(Cui, factors=64, iterations=5):
    """End-to-end COLD first-fit wall time: public-API defaults (pow2 grid,
    concurrent side compiles, single COO upload) against a fresh persistent
    compile cache — the first-run experience number the round-2 verdict
    flagged (929s recorded then for the first ALS leg).

    Runs in a subprocess (its own jax, its own empty cache dir) so this
    process's warm caches can't leak in, and a hung compile service can't
    take the whole benchmark down.
    """
    import os
    import subprocess
    import sys
    import tempfile

    import jax

    # the child inherits the accelerator env (JAX_PLATFORMS / plugin
    # registration) as-is; only a CPU-forced parent (tests, smokes) needs
    # the explicit config override, since env alone can't win over the
    # accelerator sitecustomize
    force_cpu = jax.default_backend() == "cpu"
    cpu_line = ("jax.config.update('jax_platforms', 'cpu')\n"
                if force_cpu else "")
    script = (
        "import time, numpy as np, jax, scipy.sparse as sp\n"
        + cpu_line +
        f"jax.config.update('jax_compilation_cache_dir', {tempfile.mkdtemp(prefix='jax_cold_bench_')!r})\n"
        "from implicit_tpu.als import AlternatingLeastSquares\n"
        "Cui = sp.load_npz('/tmp/bench_cold_input.npz')\n"
        "t0 = time.time()\n"
        f"m = AlternatingLeastSquares(factors={factors}, iterations={iterations},\n"
        "                            dtype=np.float16, random_state=0)\n"
        "m.fit(Cui, show_progress=False)\n"
        "print('COLD_WALL', time.time() - t0)\n"
    )
    import scipy.sparse as sp

    sp.save_npz("/tmp/bench_cold_input.npz", Cui)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__)) + ":" + env.get("PYTHONPATH", "")
    try:
        out = subprocess.run([sys.executable, "-c", script], env=env,
                             capture_output=True, text=True,
                             timeout=int(os.environ.get("BENCH_COLD_TIMEOUT", 1500)))
        for line in out.stdout.splitlines():
            if line.startswith("COLD_WALL"):
                return float(line.split()[1])
        print("cold-fit subprocess failed:", out.stderr[-500:], file=sys.stderr)
    except subprocess.TimeoutExpired:
        print("cold-fit subprocess timed out", file=sys.stderr)
    return None


def bench_compile_probe(n=2):
    """Seconds to compile one fresh trivial program, measured n times.

    The remote compile service's per-program latency swings between ~1s
    and ~10min across sessions (see STATUS.md round 3/4 incidents), which
    dominates every cold-compile row in this file. Each probe bakes a
    unique constant into the HLO so no cache (in-process, persistent, or
    service-side) can hit; the numbers let a reader separate "the code got
    slower" from "the service was degraded during this window".
    """
    import jax
    import jax.numpy as jnp

    out = []
    for _ in range(n):
        salt = float(int(time.time() * 1e6) % (1 << 20)) + 0.5
        x = jnp.ones((64, 64), jnp.float32)
        t0 = time.time()
        try:
            float(jnp.sum(jax.jit(lambda a: a @ a + salt)(x)))
        except _StageTimeout:
            # keep the lower bound the interrupted probe measured
            out.append(f">={time.time() - t0:.0f}s(timeout)")
            break
        out.append(round(time.time() - t0, 2))
    return out


def bench_sgd_epochs(model_cls, Cui, **kwargs):
    """Seconds per epoch via the fit callback; epoch 0 absorbs compiles."""
    times = []
    model = model_cls(iterations=2, **kwargs)
    model.fit(Cui, show_progress=False, callback=lambda e, t, *a: times.append(t))
    return min(times[1:]) if len(times) > 1 else times[0]


def bench_serving_device(Cui, factors=128, batch=8192, k=10, reps=10):
    """Ops-layer top-k throughput (users/s): factor tables and queries
    already device-resident, per-query liked-filters on. Approximates
    colocated-production serving; the end-to-end rows below additionally
    pay the public API's host-side prep and the session's transport."""
    import jax.numpy as jnp

    from implicit_tpu.ops import topk as topk_ops

    rng = np.random.default_rng(3)
    items = jnp.asarray(rng.standard_normal((Cui.shape[1], factors), dtype=np.float32))
    queries = jnp.asarray(rng.standard_normal((batch, factors), dtype=np.float32))
    _sync(items), _sync(queries)

    def run():
        t0 = time.time()
        for i in range(reps):
            ids, _ = topk_ops.topk(
                items, queries, k, filter_query_items=Cui[:batch]
            )
        return time.time() - t0

    run()  # warmup / compile
    return batch * reps / min(run() for _ in range(3))


def bench_serving(Cui, factors=128, batch=1024, n_batches=8, k=10, dtype=np.float32):
    """End-to-end batched recommend throughput (users/s), own-likes filtered.

    ``dtype=np.float16`` serves through the bf16 device factor table (half
    the table bytes, MXU bf16 GEMM with f32 accumulation)."""
    from implicit_tpu.als import AlternatingLeastSquares

    rng = np.random.default_rng(3)
    model = AlternatingLeastSquares(factors=factors, dtype=dtype)
    model.user_factors = rng.standard_normal((Cui.shape[0], factors), dtype=np.float32)
    model.item_factors = rng.standard_normal((Cui.shape[1], factors), dtype=np.float32)

    userids = np.arange(batch)
    model.recommend(userids, Cui[userids], N=k)  # warmup / compile

    def run():
        t0 = time.time()
        for i in range(n_batches):
            users = np.arange(i * batch, (i + 1) * batch)
            ids, _ = model.recommend(users, Cui[users], N=k)
        assert ids.shape == (batch, k)
        return time.time() - t0

    # best of 3: session transport latency varies ~2x between calls
    return batch * n_batches / min(run() for _ in range(3))


def bench_serving_pipelined(Cui, factors=128, batch=1024, n_batches=8, k=10):
    """Streaming recommend throughput (users/s) at small batches: the
    recommend_pipelined generator keeps a bounded window of batches in
    flight, hiding each call's host-prep/transport legs behind device
    compute of its neighbors. Same inputs as the batch-1024 row above —
    the delta between the two rows is recovered dispatch overhead."""
    from implicit_tpu.als import AlternatingLeastSquares

    rng = np.random.default_rng(3)
    model = AlternatingLeastSquares(factors=factors)
    model.user_factors = rng.standard_normal((Cui.shape[0], factors), dtype=np.float32)
    model.item_factors = rng.standard_normal((Cui.shape[1], factors), dtype=np.float32)

    userids = np.arange(batch)
    model.recommend(userids, Cui[userids], N=k)  # warmup / compile

    def run():
        batches = [np.arange(i * batch, (i + 1) * batch) for i in range(n_batches)]
        t0 = time.time()
        out = list(model.recommend_pipelined(
            ((b, Cui[b]) for b in batches), N=k, max_in_flight=4))
        assert len(out) == n_batches and out[-1][0].shape == (batch, k)
        return time.time() - t0

    run()  # warmup / compile
    return batch * n_batches / min(run() for _ in range(3))


def bench_serving_ivf(Cui, factors=128, batch=1024, n_batches=4, k=10):
    """TPU-native IVF approximate serving: throughput (users/s) + recall@10
    vs the exact MXU path on the same factors. Capability row for the
    beyond-reference ANN layer (the reference needs faiss/annoy/nmslib for
    this surface); at this catalog size exact brute force is competitive —
    the IVF win is catalogs whose factor tables outgrow device residency."""
    import warnings

    from implicit_tpu.als import AlternatingLeastSquares
    from implicit_tpu.ann.ivf import TPUIVFModel

    rng = np.random.default_rng(3)
    model = AlternatingLeastSquares(factors=factors)
    # clustered factors (mixture of Gaussians): trained embeddings cluster,
    # and IVF recall is only meaningful on clusterable data — isotropic
    # random factors are its worst case (recall ~0.5 measured)
    centers_i = rng.standard_normal((256, factors), dtype=np.float32) * 2.0
    centers_u = rng.standard_normal((256, factors), dtype=np.float32) * 2.0
    model.user_factors = (
        centers_u[rng.integers(0, 256, Cui.shape[0])]
        + rng.standard_normal((Cui.shape[0], factors), dtype=np.float32) * 0.5)
    model.item_factors = (
        centers_i[rng.integers(0, 256, Cui.shape[1])]
        + rng.standard_normal((Cui.shape[1], factors), dtype=np.float32) * 0.5)
    # n_probe=8 of ~800 lists: measured 0.97 recall on clustered factors
    # (1% of the catalog scored per query); exact brute force still wins at
    # this catalog size — see the docstring
    wrapper = TPUIVFModel(model, random_state=7, n_probe=8)
    wrapper._build_indexes(model.item_factors)

    userids = np.arange(batch)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        wrapper.recommend(userids, Cui[userids], N=k)  # warmup / compile

        def run():
            t0 = time.time()
            for i in range(n_batches):
                users = np.arange(i * batch, (i + 1) * batch)
                ids, _ = wrapper.recommend(users, Cui[users], N=k)
            return ids, time.time() - t0

        ids, _ = run()
        best = min(run()[1] for _ in range(3))
        exact_ids, _ = model.recommend(
            np.arange((n_batches - 1) * batch, n_batches * batch),
            Cui[(n_batches - 1) * batch: n_batches * batch], N=k)
    recall = float(np.mean([
        len(np.intersect1d(a, b)) / k for a, b in zip(ids, exact_ids)
    ]))
    return {"users_per_s": round(batch * n_batches / best),
            "recall_at_10_vs_exact": round(recall, 3)}


def bench_serving_streaming(factors=128, batch=1024, k=10):
    """Exact top-k from a HOST-resident table (the beyond-HBM serving path):
    wall time for one pass + id agreement vs the resident engine."""
    from implicit_tpu.ops.topk import topk, topk_streaming

    rng = np.random.default_rng(3)
    items = rng.standard_normal((ITEMS, factors)).astype(np.float32)
    queries = rng.standard_normal((batch, factors)).astype(np.float32)

    topk_streaming(items, queries, k)  # warmup / compile
    t0 = time.time()
    ids_s, _ = topk_streaming(items, queries, k)
    wall = time.time() - t0
    ids_r, _ = topk(items, queries, k)
    agreement = float(np.mean([
        len(np.intersect1d(a, b)) / k for a, b in zip(ids_s, ids_r)]))

    # streaming x sharding composed (mesh=1 here; blocks row-shard over the
    # mesh with an ICI candidate merge per block on real multi-chip)
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:1]), ("d",))
    topk_streaming(items, queries, k, mesh=mesh)  # warmup / compile
    t0 = time.time()
    ids_m, _ = topk_streaming(items, queries, k, mesh=mesh)
    wall_m = time.time() - t0
    mesh_agreement = float(np.mean(ids_m == ids_s))
    return {"users_per_s": round(batch / wall),
            "agreement_vs_resident": agreement,
            "mesh_users_per_s": round(batch / wall_m),
            "mesh_agreement_vs_single": mesh_agreement}


def bench_knn_fit(Cui):
    """BM25 item-item KNN fit wall at catalog scale — the host-side fused
    SMMP kernel (native/packer.cpp:knn_all_pairs); one of the reference's
    flagship last.fm workloads (/root/reference/examples/lastfm.py)."""
    from implicit_tpu.nearest_neighbours import BM25Recommender

    t0 = time.time()
    model = BM25Recommender(K=20)
    model.fit(Cui, show_progress=False)
    wall = time.time() - t0
    assert model.similarity.nnz > 0
    return wall


def bench_quality():
    """End-to-end p@10 per model family on a clustered synthetic set
    (3000x600, 20 groups) — the quality-parity gate across families."""
    from implicit_tpu.als import AlternatingLeastSquares
    from implicit_tpu.bpr import BayesianPersonalizedRanking
    from implicit_tpu.datasets.synthetic import get_synthetic_clustered
    from implicit_tpu.ease import EASERecommender
    from implicit_tpu.evaluation import ranking_metrics_at_k, train_test_split
    from implicit_tpu.lmf import LogisticMatrixFactorization
    from implicit_tpu.nearest_neighbours import BM25Recommender

    likes = get_synthetic_clustered(users=3000, items=600, groups=20,
                                    likes_per_user=24, seed=7)
    train, test = train_test_split(likes, train_percentage=0.8, random_state=19)
    models = {
        "als": AlternatingLeastSquares(factors=64, regularization=0.05,
                                       iterations=15, random_state=42),
        "bpr": BayesianPersonalizedRanking(factors=63, iterations=200,
                                           random_state=42),
        "lmf": LogisticMatrixFactorization(factors=30, random_state=42),
        "bm25": BM25Recommender(K=60),
        "ease": EASERecommender(K=100, regularization=50.0),
    }
    out = {}
    for name, model in models.items():
        try:
            model.fit(train, show_progress=False)
            metrics = ranking_metrics_at_k(model, train, test, K=10,
                                           show_progress=False)
            out[name] = round(float(metrics["precision"]), 4)
        except Exception as exc:  # one family must not null the whole gate
            out[name] = None  # keep the value numeric-or-null for consumers
            out[f"{name}_error"] = type(exc).__name__
    return out


def bench_quality_real():
    """The reference's one real-data integration gate — ALS p@10 > 0.2 on
    actual MovieLens-100k (/root/reference/tests/evaluation_test.py:103-119)
    — run automatically whenever the HDF5 is present locally
    (``IMPLICIT_DATASETS_PATH`` / ``~/implicit_datasets``). Zero-egress
    environments run the same protocol on the REAL corpus committed inside
    the package (datasets/stdlib_corpus.py, ML-100k scale) so the gate
    always records a non-synthetic number."""
    import numpy as np

    from implicit_tpu.datasets.movielens import get_movielens, probe_movielens
    from implicit_tpu.evaluation import precision_at_k, train_test_split
    from implicit_tpu.models.als import AlternatingLeastSquares

    if probe_movielens("100k") is None:
        from implicit_tpu.datasets.stdlib_corpus import get_stdlib_corpus

        _, _, counts = get_stdlib_corpus()
        train, test = train_test_split(counts, train_percentage=0.8,
                                       random_state=42)
        model = AlternatingLeastSquares(factors=64, regularization=0.05,
                                        random_state=3)
        model.fit(train, show_progress=False)
        p10 = float(precision_at_k(model, train, test, K=10,
                                   show_progress=False))
        return {"value": round(p10, 4), "dataset": "stdlib-corpus (real, committed)",
                "passes_ref_gate": p10 > 0.2,
                "note": "movielens_100k.hdf5 not cached; gate ran on the "
                        "committed real corpus instead"}

    _, ratings = get_movielens(variant="100k")
    ratings.data[ratings.data < 3.0] = 0          # reference protocol:
    ratings.eliminate_zeros()                     # min_rating=3, binary prefs
    ratings.data = np.ones(len(ratings.data))
    user_ratings = ratings.T.tocsr()
    train, test = train_test_split(user_ratings)
    model = AlternatingLeastSquares()
    model.fit(train, show_progress=False)
    p10 = float(precision_at_k(model, train, test, show_progress=False))
    return {"value": round(p10, 4), "dataset": "movielens-100k",
            "passes_ref_gate": p10 > 0.2}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from implicit_tpu.bpr import BayesianPersonalizedRanking
    from implicit_tpu.datasets.synthetic import generate_synthetic
    from implicit_tpu.lmf import LogisticMatrixFactorization
    from implicit_tpu.sparse import BucketedCSR

    extras = {}
    stages = []
    bench_t0 = time.time()

    def emit():
        """Print-and-flush the CURRENT full record as one JSON line.

        Called after every stage (and from the SIGTERM trap): the driver's
        parser takes the last JSON line, so a kill at any point still yields
        every stage completed so far — the round-4 record was lost because
        the old version printed exactly once, at the very end.
        """
        headline = extras.get(f"als_f{HEADLINE_FACTORS}_s_per_iter", {})
        result = {
            "metric": "als_train_s_per_iter_lastfm360k_f128",
            "value": headline.get("value"),
            "unit": "s/iter",
            "vs_baseline": headline.get("vs_baseline"),
            "extras": extras,
        }
        print(json.dumps(result), flush=True)
        print("# stages: " + " ".join(stages), file=sys.stderr, flush=True)

    def _on_term(signum, frame):
        stages.append(f"KILLED(sig{signum})@{time.time() - bench_t0:.0f}s")
        emit()
        os._exit(0)  # partial record parsed as success; skip jax teardown

    signal.signal(signal.SIGTERM, _on_term)

    # emit an (all-null) record IMMEDIATELY: if the transport is hard-down
    # and even backend init hangs past the driver's budget, the parser still
    # finds one JSON line instead of nothing (the round-4 failure mode)
    stages.append("start")
    emit()

    def stage(name, fn, timeout=STAGE_TIMEOUT, skip=None):
        if skip:
            stages.append(f"{name}=SKIPPED({skip})")
            return None
        if time.time() - bench_t0 > GLOBAL_DEADLINE:
            stages.append(f"{name}=SKIPPED(global deadline)")
            return None
        t0 = time.time()
        try:
            out = _stage_guard(fn, timeout)
        except _StageTimeout:
            stages.append(f"{name}=TIMEOUT@{timeout}s")
            return None
        except Exception as exc:  # a failed stage records null, not a crash
            stages.append(f"{name}=FAILED({type(exc).__name__})")
            return None
        stages.append(f"{name}={time.time() - t0:.1f}s")
        return out

    # compile-service health FIRST (short timeout — when the service is
    # degraded this reads a lower bound and gates the cold-compile stages
    # below instead of burning the budget): per-program latency swings
    # ~1s..~10min across sessions (STATUS.md round 3/4 incidents)
    probe0 = stage("compile_probe", lambda: bench_compile_probe(n=1), timeout=120)
    degraded = (not probe0) or any(
        isinstance(p, str) or p > DEGRADED_COMPILE_S for p in probe0)
    extras["compile_service_probe_s"] = {
        "value": {"run_start": probe0, "degraded": degraded},
        "note": "fresh-program compile latency; cold rows scale with this",
    }
    emit()

    t0 = time.time()
    Cui = generate_synthetic(USERS, ITEMS, NNZ, seed=0)
    Ciu = Cui.T.tocsr()
    gen_s = time.time() - t0

    t0 = time.time()
    # buckets follow the model fit's chunk policy per (width, dtype) so the
    # rows measure the PRODUCT configuration (the wide-factor rows were
    # previously measured through f=128-sized buckets whose oversized
    # gathered blocks defeat double-buffering — round5_chunk_sweep.py);
    # distinct policy targets share one build+upload
    from implicit_tpu.sparse import als_chunk_target

    _buckets = {}

    def buckets_for(factors, compute_dtype):
        target = als_chunk_target(factors, compute_dtype)
        if target not in _buckets:
            _buckets[target] = (
                BucketedCSR(Cui, target_entries=target,
                            max_chunk_rows=65536).to_device(),
                BucketedCSR(Ciu, target_entries=target,
                            max_chunk_rows=65536).to_device(),
            )
        return _buckets[target]

    user_buckets, item_buckets = buckets_for(128, "bfloat16")
    prep_s = time.time() - t0

    # ALS across factor counts, HEADLINE FIRST: bf16 tiles with f32
    # accumulation is the TPU-native production mode (analogous to the
    # reference GPU's fp16); the f32 mode is benchmarked at 128 as well
    for f in (128, 64, 256, 192):
        s = stage(f"als{f}", lambda f=f: bench_als(
            Cui, *buckets_for(f, "bfloat16"), f, "bfloat16"))
        extras[f"als_f{f}_s_per_iter"] = _row(s, A6000_S_PER_ITER[f])
        emit()
    s_f32 = stage("als128_f32", lambda: bench_als(
        Cui, *buckets_for(128, "float32"), 128, "float32"))
    extras["als_f128_float32_s_per_iter"] = _row(s_f32, A6000_S_PER_ITER[128])
    emit()
    # int8 gather-table mode at wide F: the 176MB bf16 user table at F=256
    # misses the VMEM promotion boundary and gathers at the HBM per-index
    # rate; the int8 copy (88MB + scales) fits back under it
    # (ops/als._quantize_table, benchmarks/round5_int8_gather.py)
    s_q = stage("als256_int8", lambda: bench_als(
        Cui, *buckets_for(256, "bfloat16"), 256, "bfloat16",
        gather_quant=(False, True)))
    extras["als_f256_int8gather_s_per_iter"] = _row(s_q, A6000_S_PER_ITER[256])
    emit()

    # the reference's second benchmark dataset (ML-20M shape)
    def _ml20m_leg():
        ml_cui = generate_synthetic(ML20M_USERS, ML20M_ITEMS, ML20M_NNZ, seed=1)
        ml_ciu = ml_cui.T.tocsr()
        ml_ub = BucketedCSR(ml_cui, target_entries=1 << 24,
                            max_chunk_rows=65536).to_device()
        ml_ib = BucketedCSR(ml_ciu, target_entries=1 << 24,
                            max_chunk_rows=65536).to_device()
        return bench_als(ml_cui, ml_ub, ml_ib, 128, "bfloat16")

    s_ml = stage("ml20m_als128", _ml20m_leg)
    extras["ml20m_als_f128_s_per_iter"] = _row(s_ml, A6000_ML20M_S_PER_ITER[128])
    emit()

    qps_dev = stage("serving_dev", lambda: bench_serving_device(Cui))
    extras["topk_users_per_s_resident_batch8192_160k_items"] = _row(qps_dev, digits=0)
    # device-only batch-1024: same shapes as the end-to-end batch-1024 row
    # below but with tables/queries resident and filters prebuilt — the
    # recorded evidence that the small-batch gap is the transport, not the
    # device (VERDICT r3 weak item 6)
    qps_dev1k = stage("serving_dev1k", lambda: bench_serving_device(
        Cui, batch=1024, reps=20))
    extras["recommend_batch1024_device_only_users_per_s"] = _row(qps_dev1k, digits=0)
    qps = stage("serving", lambda: bench_serving(Cui))
    extras["recommend_users_per_s_batch1024_160k_items"] = _row(qps, digits=0)
    # bigger batches amortize the per-call host/transport round trip
    qps8k = stage("serving8k", lambda: bench_serving(Cui, batch=8192, n_batches=4))
    extras["recommend_users_per_s_batch8192_160k_items"] = _row(qps8k, digits=0)
    # 16-bit-storage model: bf16 scoring GEMM (the reference GPU's fp16
    # serving analogue) — the delta vs the row above is the bf16 MXU win
    qps8k16 = stage("serving8k_bf16", lambda: bench_serving(
        Cui, batch=8192, n_batches=4, dtype=np.float16))
    extras["recommend_users_per_s_batch8192_bf16_table"] = _row(qps8k16, digits=0)
    # ...or keep small batches and hide the round trips behind the device:
    qps_pl = stage("serving_pipelined", lambda: bench_serving_pipelined(Cui))
    extras["recommend_pipelined_users_per_s_batch1024_160k_items"] = _row(qps_pl, digits=0)
    emit()

    bpr_s = stage("bpr", lambda: bench_sgd_epochs(
        BayesianPersonalizedRanking, Cui, factors=128, random_state=1))
    extras["bpr_s_per_epoch_f128"] = _row(bpr_s, digits=3)
    # reference-comparable units: one epoch visits ~nnz sample pairs
    # (bpr.cu:72-137 processes nnz samples per bpr_update call)
    extras["bpr_samples_per_s_f128"] = _row(
        Cui.nnz / bpr_s if bpr_s else None, digits=0)
    emit()
    # the classic sampled epoch (the default before round 5's grouped
    # engine) for round-over-round continuity
    bpr_cls = stage("bpr_sampled", lambda: bench_sgd_epochs(
        BayesianPersonalizedRanking, Cui, factors=128, random_state=1,
        epoch_mode="sampled"))
    extras["bpr_s_per_epoch_f128_sampled"] = _row(bpr_cls, digits=3)
    emit()

    lmf_s = stage("lmf", lambda: bench_sgd_epochs(
        LogisticMatrixFactorization, Cui, factors=32, random_state=1))
    extras["lmf_s_per_epoch_f32_negprop30"] = _row(lmf_s, digits=3)
    emit()

    knn_s = stage("knn_fit", lambda: bench_knn_fit(Cui))
    extras["knn_bm25_k20_fit_wall_s"] = _row(knn_s, digits=1)
    emit()

    p10 = stage("quality", lambda: bench_quality())
    extras["als_p10_clustered_synthetic"] = {"value": p10["als"] if p10 else None}
    extras["p10_clustered_synthetic_by_model"] = {"value": p10}
    real = stage("quality_real", lambda: bench_quality_real())
    extras["als_p10_movielens100k_real"] = real or {"value": None, "note": "stage skipped"}
    emit()

    # ---- optional / cold-compile stages: behind the headline rows, gated
    # on service health and the global deadline ----

    # the pow2 default grid's steady-state cost (the fine rows above are the
    # opt-in grid="fine" mode) — documents the compile-time/padding trade;
    # bucket prep/upload runs inside the stage so the watchdog covers it
    def _pow2_leg():
        ub = BucketedCSR(Cui, target_entries=1 << 24, max_chunk_rows=65536,
                         grid="pow2").to_device()
        ib = BucketedCSR(Ciu, target_entries=1 << 24, max_chunk_rows=65536,
                         grid="pow2").to_device()
        return bench_als(Cui, ub, ib, 128, "bfloat16")

    s_p2 = stage("als128_pow2", _pow2_leg)
    extras["als_f128_pow2grid_s_per_iter"] = _row(s_p2, A6000_S_PER_ITER[128])
    emit()

    ivf = stage("serving_ivf", lambda: bench_serving_ivf(Cui))
    extras["ivf_recommend_batch1024_160k_items"] = {
        "value": ivf, "note": None if ivf else "stage timed out or failed"}
    # beyond-HBM capability row: exact serving from a host-resident table.
    # Through the dev tunnel every pass re-uploads the table at ~24MB/s, so
    # this measures the transport, not the design (colocated hosts stream at
    # PCIe/DMA rates); recorded for the capability, with exactness checked.
    strm = stage("serving_streaming", lambda: bench_serving_streaming())
    extras["topk_streaming_batch1024_160k_items"] = {
        "value": strm, "note": "host-table exact serving; tunnel-bound here"
        if strm else "stage timed out or failed"}
    emit()

    # cold first-fit wall (fresh persistent cache in a subprocess). Runs
    # LAST and only on a healthy compile service: it is the slowest, most
    # environment-dependent row, and it must never cost the headline rows
    # (VERDICT r4 item 1). Parent-process compiles can't leak in (the child
    # gets its own empty cache dir), though a service-side cache — if one
    # exists — could make this read low relative to a truly cold session.
    cold_s = stage("als_cold_fit", lambda: bench_cold_fit(Cui),
                   timeout=max(STAGE_TIMEOUT, 1500),
                   skip="degraded compile service" if degraded else None)
    extras["als_cold_first_fit_wall_s_factors64"] = _row(cold_s, digits=1)
    emit()

    probe1 = stage("compile_probe_end", lambda: bench_compile_probe(n=1),
                   timeout=120)
    extras["compile_service_probe_s"]["value"]["run_end"] = probe1
    emit()
    print(
        f"# nnz={Cui.nnz} gen={gen_s:.1f}s prep={prep_s:.1f}s " + " ".join(stages),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
