#!/usr/bin/env python
"""Bench harness (driver contract + BASELINE.md scaling evidence).

Prints ONE COMPACT JSON line as the FINAL stdout line (the driver's tail
capture is ~2000 chars, so the line carries headline numbers only):
  {"metric": "kg_construct_e2e_sec", "value": <total sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": <sf>,
   "pipeline": {docs, triples, sec, docs_per_sec, triples_per_sec},
   "scaling": {pair, eff, ceil, norm_eff, infl, work_eff, median_pair_eff,
               tp: {n, 4n}, aux: {pair, eff, ceil, infl}},
   "detail": "BENCH_DETAIL_r<N>.json"}
Full detail — per-stage CPU tables, all trial times, ceiling samples,
per-query raw samples, the auxiliary saturated-pair record — goes to
BENCH_DETAIL_r<N>.json next to this script (round inferred from existing
BENCH_r*.json artifacts; override with $SPARK_GRAFT_ROUND).

- headline operator queries from __spark_entry__ run at $SPARK_GRAFT_SF_DIR
  (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS];
- the full KG pipeline runs over a deterministic synthetic interleaved
  corpus ($SPARK_GRAFT_BENCH_DOCS docs, default 20000) written to parquet
  first so the measured job reads a real table;
- scaling: the same pipeline job at local[N] vs local[4N] (default 1 vs 4)
  on the same parquet input (the sandbox stand-in for N vs 4N executors —
  BASELINE.json north_rule); efficiency = tp4N / (4 · tpN), with the
  interleaved-pair / paired-ceiling / CPU-time-inflation protocol described
  at _scaling; one honest 4→16 pair rides along (aux) so the
  memory-bandwidth-knee adjudication stays auditable every round.
  Disable with SPARK_GRAFT_SCALING=0.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))
RUN_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"


def _synth_corpus_parquet(spark, n_docs: int) -> str:
    from kgraph_spark import synth

    path = os.path.join(tempfile.gettempdir(), f"kg_bench_corpus_{n_docs}")
    marker = Path(path) / "_SUCCESS"
    if not marker.exists():
        synth.documents_df(spark, n_docs).write.mode("overwrite").parquet(path)
    return path


def _run_pipeline(spark, corpus_path: str) -> dict:
    from kgraph_spark import synth
    from kgraph_spark.pipeline import run_pipeline

    docs = spark.read.parquet(corpus_path)
    t0 = time.time()
    res = run_pipeline(spark, docs, synth.gazetteer_rows())
    n_triples = res.triples.count()
    dt = time.time() - t0
    n_docs = docs.count()
    res.unpersist()
    return {
        "docs": n_docs,
        "triples": n_triples,
        "sec": round(dt, 2),
        "docs_per_sec": round(n_docs / dt, 1),
        "triples_per_sec": round(n_triples / dt, 1),
    }


# N vs 4N parallelism for the scaling-efficiency evidence. Default 1→4:
# the pair must stay below this box's MEMORY-BANDWIDTH knee at BOTH levels,
# or the ratio measures socket saturation instead of plan scaling. Measured
# round 3 (BENCH.md): per-100k-doc wall time is ~105s at 1 thread, 27s at 4
# (eff 0.96 best / 0.88 recorded pair), 52s/100k·2th → 19.5/100k·8th
# (2→8 eff 0.67), 13.1/100k·16th (4→16 eff 0.52); executorCpuTime inflation
# for the identical job is 1.08× at 1→4 but 1.6× at 4→16 — per-thread
# bandwidth collapses past ~8 concurrent workers. A real cluster adds a
# socket/memory subsystem with every node (and sizes executors at 2-8
# cores), so the pair with flat per-thread bandwidth is the one that
# models node-count scaling; the saturated pairs are recorded in BENCH.md
# as the knee evidence. SPARK_GRAFT_SCALE_N overrides.
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1"))
# 250k docs ≈ 280s at 1 thread / 78s at 4 — big enough that the fixed floor
# (~8-10s/session) is noise at both levels, small enough for ≥3-4
# interleaved pairs inside the bench budget. At SCALE_N=4 the round-2 450k
# sizing still applies (Amdahl fit in BENCH.md).
SCALING_DOCS = int(
    os.environ.get("SPARK_GRAFT_SCALING_DOCS", "250000" if SCALE_N == 1 else "450000")
)
SCALING_TRIALS = int(os.environ.get("SPARK_GRAFT_SCALING_TRIALS", "5"))

# AQE is the production default (skew-join splitting + shuffle coalescing at
# real cluster scale), but its per-shuffle-stage re-planning adds ~2× fixed
# driver latency on this DAG at toy shuffle sizes (measured: 45s vs 22s at
# 20k docs), so the local microbench pins it off. Shuffle goes through
# tmpfs when available: local mode funnels ALL shuffle I/O through one
# shared disk, which serializes it regardless of cores — a real cluster
# spreads shuffle across per-node disks, and tmpfs emulates that bandwidth
# (measured: raw 4→16 efficiency 0.65 on disk → 0.79 on tmpfs). See BENCH.md.
_BENCH_CONF = {
    "spark.sql.adaptive.enabled": "false",
    # split parquet scans fine enough that the input-parallelism guard in
    # run_pipeline sees >= 3x cores partitions FROM THE SCAN and skips its
    # repartition — removes a full corpus-sized shuffle (1.2 GB at 450k
    # docs) from every pipeline run. A real cluster's input always has
    # enough splits; this makes local mode match that shape.
    # 2 MB (vs 128 MB default): the synth corpus compresses ~5x, so split
    # size must be small enough in COMPRESSED bytes to yield 3x-cores tasks
    "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
}
if os.path.isdir("/dev/shm"):
    _shm = "/dev/shm/spark-local"
    os.makedirs(_shm, exist_ok=True)
    _BENCH_CONF["spark.local.dir"] = _shm


def _burn(_n):
    x = 0
    for i in range(8_000_000):
        x += i * i
    return x


def _cpu_baseline(procs: int, waves: int | None = None) -> float:
    """Raw-CPU throughput probe (pure-Python busy loops, no Spark): the
    hardware ceiling for any parallel speedup on this box at this moment.
    The VM shows hypervisor steal that varies over minutes, so the ceiling
    is sampled alongside the pipeline trials. Small proc counts run more
    waves so each probe integrates over a comparable wall-time window."""
    import multiprocessing as mp
    import time as _t

    if waves is None:
        waves = max(2, 8 // procs)
    t0 = _t.time()
    with mp.Pool(procs) as p:
        p.map(_burn, range(procs * waves))
    return procs * waves / (_t.time() - t0)


def _ceiling_sample(n: int, n4: int, retries: int = 2) -> float | None:
    """One paired hardware-ceiling sample: raw-CPU throughput at n4 procs ÷
    (4 × throughput at n procs), the two probes run back-to-back so they see
    the same hypervisor weather. A ratio > 1.0 is physically impossible
    (4× the workers cannot do more than 4× the work on fixed hardware) and
    means the weather flipped between the two probes — resample up to
    `retries` times, else discard (round-2's 1.2 'ceiling' poisoned the
    normalized metric; this guard is the fix)."""
    for _ in range(retries + 1):
        tp_n = _cpu_baseline(n)
        tp_n4 = _cpu_baseline(n4)
        ratio = tp_n4 / (4.0 * tp_n)
        if ratio <= 1.0:
            return ratio
    return None


def _stage_metrics(spark, skip_stage_ids) -> tuple[list[dict], set]:
    """Per-completed-stage metrics via the UI status API, excluding
    `skip_stage_ids`. Returns ([{stage, name, run_sec, cpu_sec}], all_ids).

    run_sec sums executorRunTime (task WALL time: includes in-task shuffle
    waits, GC, and hypervisor descheduling — an upper bound on CPU work);
    cpu_sec sums executorCpuTime (thread CPU nanoseconds: excludes OS
    scheduler wait and I/O, counts memory-stall cycles — the contention
    signal — but on this virtualization stack guest CPU clocks still tick
    through hypervisor steal, so cpu_sec is steal-REDUCED, not steal-free).
    Network failures degrade to an empty list — metric collection must
    never lose a finished trial."""
    import json as _json
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    if not base:
        return [], set()
    try:
        apps = _json.load(urllib.request.urlopen(f"{base}/api/v1/applications", timeout=10))
        app = apps[0]["id"]
        stages = _json.load(
            urllib.request.urlopen(
                f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=10
            )
        )
    except Exception:
        return [], set()
    ids = {s["stageId"] for s in stages}
    rows = [
        {
            "stage": s["stageId"],
            "name": (s.get("name") or "")[:60],
            "run_sec": round(s.get("executorRunTime", 0) / 1e3, 2),
            "cpu_sec": round(s.get("executorCpuTime", 0) / 1e9, 2),
        }
        for s in stages
        if s["stageId"] not in skip_stage_ids
    ]
    return rows, ids


def _one_trial(cores: int, corpus: str, warmup_corpus: str | None) -> dict:
    from kgraph_spark.session import get_spark, stop_spark

    # shuffle partitions 3× cores: one-wave shuffles make every straggler
    # core a stage-long bottleneck under hypervisor steal (see pipeline.py)
    conf = dict(_BENCH_CONF)
    # UI on (random port) so the trial can read its own task metrics — the
    # executor CPU-seconds of the measured job feed the work-normalized
    # efficiency (see _scaling docstring)
    conf.update({"spark.ui.enabled": "true", "spark.ui.port": "0"})
    spark = get_spark(f"kg_bench_{cores}", parallelism=cores, shuffle_partitions=cores * 3,
                      extra_conf=conf)
    if warmup_corpus:
        _run_pipeline(spark, warmup_corpus)
    _, warm_ids = _stage_metrics(spark, set())
    r = _run_pipeline(spark, corpus)
    stages, _ = _stage_metrics(spark, warm_ids)
    r["executor_cpu_sec"] = round(sum(s["cpu_sec"] for s in stages), 1)
    r["executor_run_sec"] = round(sum(s["run_sec"] for s in stages), 1)
    # top stages by CPU: the self-contained evidence behind the
    # work-normalized claim (stage-level contention is visible per trial)
    r["stages_top_cpu"] = sorted(stages, key=lambda s: -s["cpu_sec"])[:8]
    stop_spark()
    return r


# 2100 -> 2500 in round 5: the query surface grew past 2100s e2e and the
# budget guard was silently skipping the 4->16 aux rider; the emit-first
# protocol already protects the artifact if a driver wall-clock kill lands
# mid-aux (a complete compact line is on stdout before the rider starts)
BENCH_BUDGET_S = int(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "2500"))
# clamp ≥1: min() over zero samples would lose the whole artifact (ADVICE r3)
QUERY_TRIALS = max(1, int(os.environ.get("SPARK_GRAFT_QUERY_TRIALS", "2")))


def _round_tag() -> str:
    """r<N> for the detail-file name: $SPARK_GRAFT_ROUND, else one past the
    newest BENCH_r*.json the driver has recorded next to this script."""
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        try:
            return f"r{int(env.strip().lstrip('rR')):02d}"
        except ValueError:
            pass  # malformed env must not lose the artifact after the run
    here = Path(__file__).resolve().parent
    rounds = []
    for p in here.glob("BENCH_r*.json"):
        try:
            rounds.append(int(p.stem.split("_r")[-1]))
        except ValueError:
            continue
    return f"r{(max(rounds) + 1) if rounds else 1:02d}"


def _aux_pair(corpus: str, warmup: str) -> dict:
    """One honest saturated pair (4→16) recorded alongside the gate pair.

    The gate pair is 1→4 — the only pair below this box's memory-bandwidth
    knee at both levels (see SCALE_N note above). The round-3 verdict
    accepted that adjudication with the caveat that a 4→16 sample must keep
    riding along in each round's record so the claim stays auditable: the
    saturated pair's low raw efficiency together with its HIGH cpu-time
    inflation (~1.6×: same job, more CPU-clock cycles per row = memory
    stalls, not plan overhead) is the evidence that the residual is the
    shared socket, not the shuffle plan."""
    n, n4 = 4, 16
    c = _ceiling_sample(n, n4)
    a = _one_trial(n, corpus, warmup)
    b = _one_trial(n4, corpus, warmup)
    infl = (
        round(b["executor_cpu_sec"] / a["executor_cpu_sec"], 3)
        if a.get("executor_cpu_sec") and b.get("executor_cpu_sec")
        else None
    )
    return {
        "scale_pair": [n, n4],
        f"local{n}": a,
        f"local{n4}": b,
        "efficiency_triples_per_sec": round(
            b["triples_per_sec"] / (4.0 * a["triples_per_sec"]), 3
        ),
        "cpu_ceiling_sample": c,
        "cpu_time_inflation_4n_vs_n": infl,
    }


def _scaling(corpus: str, warmup: str, t_start: float) -> dict:
    """Scaling-efficiency evidence (BASELINE north rule: same job at N and
    4N parallelism on the same input, throughput at both + efficiency).

    Protocol, designed for a hypervisor-steal-prone host (see BENCH.md):
      * ≥ SCALING_TRIALS interleaved trial PAIRS, alternating run order, so
        both levels sample the same weather distribution; min wall time per
        level across pairs → efficiency_triples_per_sec (raw).
      * One paired hardware-ceiling sample per trial pair (_ceiling_sample:
        back-to-back raw-CPU probes, impossible ratios > 1.0 resampled then
        discarded). cpu_ceiling_efficiency = max sane sample — the best the
        HARDWARE scaled 4N/N during this run; normalized_efficiency =
        raw / ceiling answers "did the pipeline scale as well as the box
        possibly could".
      * Per-trial executorCpuTime (thread CPU ns — excludes scheduler wait,
        counts memory-stall cycles; NOT fully steal-free on this hypervisor,
        see _stage_metrics) feeds cpu_time_inflation_4n_vs_n;
        work_normalized_efficiency = raw × inflation answers "does the PLAN
        scale when each core does constant work per row". With the default
        below-the-knee pair the inflation is ≈1 and this metric is
        SECONDARY (steal leakage into guest CPU clocks can push it either
        side of raw); the gate metrics are the raw and ceiling-normalized
        efficiencies. executorRunTime is also recorded (executor_run_sec)
        as the upper bound it is. Per-stage run/cpu tables for the best
        trial at each level make the record self-contained and auditable."""
    n, n4 = SCALE_N, SCALE_N * 4
    runs: dict[int, list[dict]] = {n: [], n4: []}
    pair_effs: list[float] = []
    ceilings: list[float] = []
    for trial in range(SCALING_TRIALS):
        # budget guard: always finish at least one trial pair, but stop
        # starting new pairs when the wall budget is nearly spent so the
        # driver always receives a complete JSON line
        if trial > 0 and time.time() - t_start > BENCH_BUDGET_S * 0.75:
            break
        c = _ceiling_sample(n, n4)
        if c is not None:
            ceilings.append(round(c, 3))
        order = (n, n4) if trial % 2 == 0 else (n4, n)
        pair: dict[int, dict] = {}
        for cores in order:
            # warm up EVERY trial: each trial is a fresh session, and the
            # Python-worker/codegen ramp otherwise lands inside the timing
            pair[cores] = _one_trial(cores, corpus, warmup)
            runs[cores].append(pair[cores])
        # adjacent-weather evidence: this pair's own efficiency
        pair_effs.append(
            round(pair[n4]["triples_per_sec"] / (4.0 * pair[n]["triples_per_sec"]), 3)
        )
    best = {c: min(rs, key=lambda r: r["sec"]) for c, rs in runs.items()}
    eff = best[n4]["triples_per_sec"] / (4.0 * best[n]["triples_per_sec"])
    ceiling = max(ceilings) if ceilings else None
    cpu_sec = {c: best[c].get("executor_cpu_sec") for c in runs}
    run_sec = {c: best[c].get("executor_run_sec") for c in runs}
    inflation = (
        round(cpu_sec[n4] / cpu_sec[n], 3)
        if cpu_sec.get(n) and cpu_sec.get(n4)
        else None
    )
    sorted_effs = sorted(pair_effs)
    median_pair_eff = sorted_effs[len(sorted_effs) // 2] if sorted_effs else None
    out = {
        "docs": SCALING_DOCS,
        "scale_pair": [n, n4],
        f"local{n}": best[n],
        f"local{n4}": best[n4],
        "all_trials_sec": {str(c): [r["sec"] for r in rs] for c, rs in runs.items()},
        "per_pair_efficiency": pair_effs,
        "median_pair_efficiency": median_pair_eff,
        "efficiency_triples_per_sec": round(eff, 3),
        "cpu_ceiling_samples": ceilings,
        "cpu_ceiling_efficiency": ceiling,
        "normalized_efficiency": round(min(eff / ceiling, 1.5), 3) if ceiling else None,
        "executor_cpu_sec_best_trial": {str(c): v for c, v in cpu_sec.items()},
        "executor_run_sec_best_trial": {str(c): v for c, v in run_sec.items()},
        "cpu_time_inflation_4n_vs_n": inflation,
        "work_normalized_efficiency": round(min(eff * inflation, 1.5), 3) if inflation else None,
    }
    return out


def main() -> None:
    from kgraph_spark.session import get_spark, stop_spark

    import __spark_entry__ as entrymod

    spark = get_spark("kg_bench", parallelism=CPUS, shuffle_partitions=CPUS,
                      extra_conf=_BENCH_CONF)
    t_all = time.time()

    # Python-worker warmup: the first Arrow/pandas stage of a session pays
    # ~10s of daemon forks + per-worker module imports across 32 workers —
    # session overhead, not query cost, so absorb it before timing
    def _wu(it):
        import kgraph_spark.functions.extraction  # noqa: F401

        for pdf in it:
            yield pdf

    spark.range(0, 64, 1, 64).mapInPandas(_wu, "id long").count()

    # Per-query time = min of QUERY_TRIALS runs (default 2): hypervisor
    # steal on this VM swings identical queries 2-4× between adjacent
    # minutes (BENCH.md), so a single sample records weather, not the plan.
    # min-of-2 is the standard microbench answer; raw samples go to the
    # detail file, the min to the compact driver line.
    qtimes: dict[str, float] = {}
    qsamples: dict[str, list[float]] = {}
    for name, fn in entrymod.queries().items():
        samples = []
        # heavy-tail pinning (r4 adjudication: kg_rule_confidence swung
        # 2.4× across 2 trials): queries whose best sample is still >10s
        # after the standard trials get ONE extra sample, so regressions in
        # the miners are distinguishable from cache/steal weather
        for t in range(QUERY_TRIALS + 1):
            if t == QUERY_TRIALS and (not samples or min(samples) <= 10.0):
                break
            if t > 0 and time.time() - t_all > BENCH_BUDGET_S * 0.25:
                break  # budget guard: second samples are a luxury
            t0 = time.time()
            try:
                fn(spark, SF_DIR).count()
            except Exception as ex:  # noqa: BLE001
                # one broken query must not cost the whole recorded artifact;
                # -1 marks the failure loudly — but only when NO trial
                # succeeded (a transient second-sample failure must not
                # overwrite a valid first measurement)
                print(f"query {name} failed: {ex}", file=sys.stderr)
                if not samples:
                    samples = [-1.0]
                break
            samples.append(time.time() - t0)
            # isolate queries: the pipeline query persists its fused
            # extraction (correct within the query — three downstream
            # branches share it), and its millions of task/row objects
            # bloat the shared local-mode JVM heap, which taxes every later
            # latency-sensitive iterative query (measured: d8 CC 4s → 29s
            # after the pipeline; explicit GC restores 6.6s). A real
            # cluster isolates this per-executor.
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        qsamples[name] = [round(s, 3) for s in samples]
        qtimes[name] = round(min(samples), 2)

    corpus = _synth_corpus_parquet(spark, BENCH_DOCS)
    warmup = _synth_corpus_parquet(spark, 2000)
    # same min-of-QUERY_TRIALS protocol as the sweep (single samples record
    # weather, not the plan); the reported throughput block is the best run
    pipeline = _run_pipeline(spark, corpus)
    for t in range(1, QUERY_TRIALS):
        if time.time() - t_all > BENCH_BUDGET_S * 0.3:
            break
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        r = _run_pipeline(spark, corpus)
        if r["sec"] < pipeline["sec"]:
            pipeline = r
    qtimes["pipeline_synth"] = pipeline["sec"]

    scaling = None
    scaling_corpus = None
    if RUN_SCALING:
        scaling_corpus = _synth_corpus_parquet(spark, SCALING_DOCS)
        stop_spark()
        scaling = _scaling(scaling_corpus, warmup, t_all)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    tag = _round_tag()
    detail_name = f"BENCH_DETAIL_{tag}.json"

    def emit(aux) -> None:
        """Write the detail file and print the compact driver line.

        Called twice when the aux 4→16 rider runs: once BEFORE (so a
        driver wall-clock kill mid-aux still leaves a complete artifact
        as the last stdout line — the round-3 lost-artifact lesson) and
        once after with the aux block added. The driver tails stdout, so
        the final print wins when both happen."""
        total = round(time.time() - t_all, 2)
        # full record → detail file (stage tables, all trials, raw samples)
        detail = {
            "value": total,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "query_samples_sec": qsamples,
            "pipeline": pipeline,
            "scaling": scaling,
            "aux_pair_4_16": aux,
            "scale_docs": SCALING_DOCS,
            "cpus": CPUS,
        }
        # a failed detail write (ENOSPC, read-only checkout) must not cost
        # the compact driver line — the line is the round's recorded record
        written_name = detail_name
        try:
            (Path(__file__).resolve().parent / detail_name).write_text(
                json.dumps(detail, indent=1)
            )
        except OSError as ex:
            print(f"detail write failed: {ex}", file=sys.stderr)
            written_name = None

        # compact driver line: headline numbers only, FINAL stdout line.
        # ~2000-char driver tail capture ate round 3's artifact; keep lean.
        # every dropped compact field (docs/sec rates, tp, median_pair_eff,
        # work_eff, per-trial tables) lives in the detail file — the line
        # carries the gate numbers only so 65+ queries still fit the
        # ~2000-char driver tail capture
        out = {
            "metric": "kg_construct_e2e_sec",
            "value": total,
            "unit": "sec",
            # 1-decimal in the line (≈66 queries must fit the tail capture;
            # 2-decimal minimums are in qtimes/detail)
            "queries": {k: (round(v, 1) if v >= 0 else v) for k, v in qtimes.items()},
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "pipeline": {k: pipeline[k] for k in ("docs", "triples", "sec")}
            if pipeline
            else pipeline,
        }
        if scaling is not None:
            out["scaling"] = {
                "pair": scaling["scale_pair"],
                "eff": scaling["efficiency_triples_per_sec"],
                "ceil": scaling["cpu_ceiling_efficiency"],
                "norm_eff": scaling["normalized_efficiency"],
                "infl": scaling["cpu_time_inflation_4n_vs_n"],
            }
            if aux is not None:
                out["scaling"]["aux"] = {
                    "pair": aux["scale_pair"],
                    "eff": aux["efficiency_triples_per_sec"],
                    "ceil": round(aux["cpu_ceiling_sample"], 3),
                    "infl": aux["cpu_time_inflation_4n_vs_n"],
                }
        out["detail"] = written_name
        line = json.dumps(out, separators=(",", ":"))
        if len(line) > 1900:  # last-resort: never exceed the tail capture
            # failure markers (-1) survive truncation unconditionally — the
            # slowest-20 cut must not hide exactly the queries that broke
            failed = {k: v for k, v in qtimes.items() if v < 0}
            slowest = sorted(
                ((k, v) for k, v in qtimes.items() if v >= 0), key=lambda kv: -kv[1]
            )[: max(0, 20 - len(failed))]
            out["queries"] = {**failed, **dict(slowest)}
            out["queries_truncated_see_detail"] = True
            line = json.dumps(out, separators=(",", ":"))
        print(line, flush=True)

    emit(None)
    # auditability rider: one saturated 4→16 pair (r3 verdict item 6),
    # re-emitting the artifact with the aux block when it completes. A
    # complete line is already on stdout, so a driver wall-clock kill
    # mid-aux costs only the rider, never the record; 180 s floor skips
    # the attempt when it clearly cannot finish a single trial.
    if (
        scaling is not None
        and scaling_corpus is not None
        and BENCH_BUDGET_S - (time.time() - t_all) > 180
    ):
        try:
            aux = _aux_pair(scaling_corpus, warmup)
        except Exception as ex:  # noqa: BLE001
            print(f"aux pair failed: {ex}", file=sys.stderr)
        else:
            emit(aux)


if __name__ == "__main__":
    main()
