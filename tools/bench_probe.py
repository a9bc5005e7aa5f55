"""Isolated-probe protocol for adjudicating bench movers (the r13-verdict
ask: ">2x movers get adjudicated with committed evidence instead of
prose").

Usage:
    python tools/bench_probe.py [SF_DIR] NAME [NAME ...]
    SPARK_GRAFT_PROBE_REPS=5 python tools/bench_probe.py sf0.1 graph_harmonic

Protocol (what makes a probe number trustworthy where an in-suite bench
number is not):
  - INTERLEAVED reps: rep r runs every probed query once before rep r+1
    starts, so a transient contention window hits all queries alike
    instead of poisoning one query's whole sample;
  - each timing starts from gc.collect() + spark.catalog.clearCache()
    (the bench.py discipline) so a probe number never depends on the
    previous query's cached relations or pending checkpoint blocks;
  - the 1-minute load average is stamped before the run, after every
    timing, and the max is published — a probe taken above LA 2 is
    flagged exactly like bench.py flags its headline;
  - median AND min are reported: the median is the comparable number,
    the min is the contention-free floor (a query whose min matches its
    old median was jitter, not regression).

Prints ONE JSON line:
  {"probe": {name: {"reps": [..], "median": m, "min": lo}}, "reps": N,
   "sf_dir": ..., "load_avg_before": .., "load_avg_max": ..,
   "warmup_sec": ..}
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _jvm_pid() -> int | None:
    """PID of this session's Spark JVM (the py4j child of this process);
    None when it can't be identified (diagnostics then skip CPU deltas)."""
    try:
        me = os.getpid()
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    parts = f.read().split()
                if int(parts[3]) != me:  # ppid
                    continue
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read()
                if b"java" in cmd:
                    return int(pid)
            except (OSError, ValueError, IndexError):
                continue
    except OSError:
        pass
    return None


def _proc_cpu_ms(pid: int | None) -> int | None:
    """Cumulative user+sys CPU of ``pid`` AND its reaped children in ms
    (utime+stime+cutime+cstime from /proc/<pid>/stat) — the children term
    folds in exited python workers, so worker churn shows up as CPU."""
    if pid is None:
        return None
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        ticks = sum(int(parts[i]) for i in (11, 12, 13, 14))
        return ticks * 1000 // os.sysconf("SC_CLK_TCK")
    except (OSError, ValueError, IndexError):
        return None


def _python_worker_pids() -> set[int]:
    """PIDs of live pyspark worker/daemon processes (cmdline match)."""
    out: set[int] = set()
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read()
                if b"pyspark.daemon" in cmd or b"pyspark.worker" in cmd:
                    out.add(int(pid))
            except OSError:
                continue
    except OSError:
        pass
    return out


def _pyw_cpu_ms() -> int:
    """Aggregate CPU (ms) of every LIVE pyspark daemon/worker process,
    including their reaped children — the compute the JVM counter can't
    see (workers are the daemon's children, not the JVM's), i.e. where
    single-task numpy solves and Arrow-batched UDFs actually burn time.
    Monotone only while the same workers stay alive; per-rep deltas can
    under-count when a worker exits mid-rep (pyw_new shows churn)."""
    total = 0
    for pid in _python_worker_pids():
        ms = _proc_cpu_ms(pid)
        if ms is not None:
            total += ms
    return total


def _jvm_gc_ms(spark) -> int | None:
    """Total JVM GC time in ms via the management MXBeans (py4j walk);
    None if the walk fails."""
    try:
        jvm = spark.sparkContext._jvm
        beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))
    except Exception:
        return None


def _jvm_threads(spark) -> int | None:
    try:
        jvm = spark.sparkContext._jvm
        return jvm.java.lang.management.ManagementFactory.getThreadMXBean().getThreadCount()
    except Exception:
        return None


def _mem_cached_kb() -> int | None:
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("Cached:"):
                    return int(line.split()[1])
    except (OSError, ValueError, IndexError):
        pass
    return None


def probe(spark, names: list[str], sf_dir: str, reps: int, diag: bool = False) -> dict:
    """Run the probe protocol; returns the result dict (separated from
    main() so pytest can drive it on a tiny SF).

    ``diag=True`` (the r14-verdict instrumentation ask) stamps per-rep:
      - ``cpu_ms``: JVM+reaped-children CPU delta — a slow rep with flat
        cpu_ms is a SCHEDULING/contention stall, one with proportional
        cpu_ms is genuine compute growth;
      - ``gc_ms``: JVM GC time delta (GC-pause-dominated reps);
      - ``pyw_new``: python worker processes that appeared during the rep
        (worker churn — the spark.python.worker.reuse failure mode);
      - ``pyw_live``: live workers after the rep;
      - ``threads``: JVM thread count after the rep;
      - ``cached_mb``: OS page cache after the rep (cold-read detection).
    """
    import __spark_entry__ as E

    qs = E.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    load_before = round(os.getloadavg()[0], 2)
    # warmup: JIT scan/agg/join codegen on the smallest SF so rep 0 of the
    # first query doesn't carry one-time classloading
    t_warm = time.time()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    try:
        for w in ("pricing_summary", "revenue_by_nation"):
            materialize(qs[w](spark, "/root/testdata/sf0.001"))
    except Exception:
        pass
    warmup = round(time.time() - t_warm, 3)

    jvm_pid = _jvm_pid() if diag else None
    samples: dict[str, list[float]] = {n: [] for n in names}
    diags: dict[str, list[dict]] = {n: [] for n in names}
    la: list[float] = [load_before]
    for _ in range(reps):
        for n in names:
            gc.collect()
            spark.catalog.clearCache()
            if diag:
                cpu0 = _proc_cpu_ms(jvm_pid)
                gc0 = _jvm_gc_ms(spark)
                pyw0 = _python_worker_pids()
                pywc0 = _pyw_cpu_ms()
            t0 = time.time()
            materialize(qs[n](spark, sf_dir))
            samples[n].append(round(time.time() - t0, 3))
            la.append(round(os.getloadavg()[0], 2))
            if diag:
                cpu1 = _proc_cpu_ms(jvm_pid)
                gc1 = _jvm_gc_ms(spark)
                pyw1 = _python_worker_pids()
                cached = _mem_cached_kb()
                diags[n].append(
                    {
                        "cpu_ms": None if None in (cpu0, cpu1) else cpu1 - cpu0,
                        "pyw_cpu_ms": max(0, _pyw_cpu_ms() - pywc0),
                        "gc_ms": None if None in (gc0, gc1) else gc1 - gc0,
                        "pyw_new": len(pyw1 - pyw0),
                        "pyw_live": len(pyw1),
                        "threads": _jvm_threads(spark),
                        "cached_mb": None if cached is None else cached // 1024,
                    }
                )
    out = {
        "probe": {
            n: {
                "reps": ts,
                "median": round(statistics.median(ts), 3),
                "min": round(min(ts), 3),
            }
            for n, ts in samples.items()
        },
        "reps": reps,
        "sf_dir": sf_dir,
        "load_avg_before": load_before,
        "load_avg_max": max(la),
        "warmup_sec": warmup,
    }
    if diag:
        for n in names:
            out["probe"][n]["diag"] = diags[n]
        out["python_worker_reuse"] = spark.conf.get(
            "spark.python.worker.reuse", "(unset)"
        )
    return out


def resolve_sf_dir(token: str) -> str | None:
    """Resolve a CLI token to an existing SF directory, or None if it is
    not one (so query names — even ones starting with 'sf' — are never
    silently consumed as a data dir; the ADVICE r14 heuristic fix)."""
    cand = token if os.path.sep in token else f"/root/testdata/{token}"
    return cand if os.path.isdir(cand) else None


def parse_args(args: list[str]) -> tuple[str, list[str]]:
    """Split CLI args into (sf_dir, query_names).

    Preference order: an explicit ``--sf-dir DIR`` / ``--sf-dir=DIR`` flag
    (SystemExit when the directory does not exist), else a positional first
    token that RESOLVES to an existing directory (a query name that merely
    starts with 'sf' is kept as a name — the ADVICE r14 heuristic fix),
    else $SPARK_GRAFT_SF_DIR / the sf0.1 default."""
    env_default = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for i, a in enumerate(args):
        if a == "--sf-dir" and i + 1 < len(args):
            flag_val, rest = args[i + 1], args[:i] + args[i + 2 :]
            break
        if a.startswith("--sf-dir="):
            flag_val, rest = a.split("=", 1)[1], args[:i] + args[i + 1 :]
            break
    else:
        flag_val, rest = None, args
    if flag_val is not None:
        resolved = resolve_sf_dir(flag_val)
        if resolved is None:
            raise SystemExit(f"--sf-dir {flag_val!r}: no such directory")
        return resolved, rest
    if rest and (os.path.sep in rest[0] or rest[0].startswith("sf")):
        resolved = resolve_sf_dir(rest[0])
        if resolved is not None:
            return resolved, rest[1:]
    return env_default, rest


def main() -> None:
    argv = sys.argv[1:]
    diag = "--diag" in argv
    if diag:
        argv = [a for a in argv if a != "--diag"]
    sf_dir, names = parse_args(argv)
    if not names:
        raise SystemExit("usage: bench_probe.py [--diag] [SF_DIR] NAME [NAME ...]")
    reps = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "5"))

    from usearch_spark.session import get_spark

    out = probe(get_spark("bench_probe"), names, sf_dir, reps, diag=diag)
    if out["load_avg_max"] > 2.0:
        print(
            f"probe WARNING: load average peaked at {out['load_avg_max']} > 2 "
            "during the run — medians may be contaminated",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
