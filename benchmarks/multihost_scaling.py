"""Multi-host scaling measurement: clique-solves/s at 1, 2, 4 localhost
processes (the BASELINE.json north-star metric: >=0.7 scaling efficiency
for clique-solves/s from 1 host to N hosts).

Fixture: anchored forest (one anchor clique on top, ``scale`` independent
3-clique branches below) — the realistic multi-session SLAM shape with one
cut edge per branch.  Each process run reports warm phase timings; the
strong-scaling efficiency is time(1) / (n * time(n)) over the warm
end-to-end solve.

Run: ``python benchmarks/multihost_scaling.py [--scale 32] [--procs 1 2 4]``
Honest caveat printed with the numbers: this host has a limited physical
core count, so configurations with more processes than cores measure the
distribution *machinery* (partition + collectives) rather than added
compute capacity.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incrementalinference.jl_tpu.parallel.multihost import launch_multihost


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=32,
                    help="branches in the anchored forest")
    ap.add_argument("--procs", type=int, nargs="+",
                    default=[1, 2, 4, 8])
    ap.add_argument("--devices-per-proc", type=int, default=1)
    a = ap.parse_args()

    ncpu = os.cpu_count() or 1
    rows = []
    for n in a.procs:
        reps = launch_multihost(n, "anchored_forest", scale=a.scale,
                                devices_per_proc=a.devices_per_proc,
                                timeout=1800)
        n_cliques = reps[0]["warm"]["n_cliques"]
        warm_total = max(r["warm"]["timings"]["total_s"] for r in reps)
        warm_up = max(r["warm"]["timings"]["local_up_s"] for r in reps)
        exch = max(r["warm"]["timings"]["exchange_up_s"]
                   + r["warm"]["timings"]["sync_s"] for r in reps)
        tmw = reps[0]["warm"]["timings"]
        coll_bytes = int(tmw.get("bytes_cut", 0) + tmw.get("bytes_sync", 0))
        row = {"procs": n, "cliques": n_cliques,
               "warm_total_s": warm_total, "warm_local_up_s": warm_up,
               "collectives_s": exch,
               "collective_bytes": coll_bytes,
               "init_passes": tmw.get("init_passes", 1),
               "cliques_per_s": n_cliques / warm_total,
               "max_err": max(r["warm"]["max_err"] for r in reps)}
        if n > 1 and "collective_latency_s" in reps[0]:
            cw = reps[0]["warm"].get("collectives", {})
            row["decomposition"] = {
                "n_collectives": int(cw.get("count", 0)),
                "collective_wall_s": float(cw.get("wall_s", 0.0)),
                "lat_8B_s": reps[0]["collective_latency_s"]["8B"],
                "lat_16kB_s": reps[0]["collective_latency_s"]["16kB"],
                "top_s": float(tmw.get("top_s", 0.0))}
        rows.append(row)
        print(f"n={n}: {n_cliques} cliques, warm total {warm_total:.3f}s "
              f"(local up {warm_up:.3f}s, collectives {exch:.3f}s, "
              f"{coll_bytes/1e3:.1f} kB/solve), "
              f"{n_cliques/warm_total:.1f} cliq/s, "
              f"max err {rows[-1]['max_err']:.3f}", flush=True)

    base = rows[0]["warm_total_s"]
    for r in rows[1:]:
        r["scaling_efficiency"] = base / (r["procs"] * r["warm_total_s"])
        r["speedup"] = base / r["warm_total_s"]
    print(f"\nhost has {ncpu} physical cores — proc counts beyond that "
          "measure distribution overhead, not added capacity")

    # ---- efficiency decomposition (VERDICT r4 item #5) -------------------
    # The residual below perfect scaling must be EXPLAINED by counted
    # buckets, each labeled whether real-pod interconnect (ICI/DCN, ~us
    # collectives) erases it or not.  gap = n*T(n) - T(1).
    for r in rows[1:]:
        dec = r.get("decomposition")
        if not dec:
            continue
        n = r["procs"]
        gap = n * r["warm_total_s"] - base
        coll = dec["collective_wall_s"]
        pred_coll = dec["n_collectives"] * dec["lat_16kB_s"]
        top = dec["top_s"]
        other = gap - n * coll - n * top
        print(f"\nn={n} decomposition (gap to perfect scaling "
              f"{gap:.3f}s of {n}x{r['warm_total_s']:.3f}s):")
        print(f"  collectives: {dec['n_collectives']} allgathers x "
              f"{dec['lat_16kB_s']*1e3:.1f} ms median probe = "
              f"{pred_coll:.3f}s predicted, {coll:.3f}s measured per proc "
              f"-> {n*coll:.3f}s of gap  [gloo-over-TCP; ICI-ERASABLE: "
              f"real pods pay us-class collectives]")
        print(f"  replicated top: {top:.3f}s per proc -> {n*top:.3f}s of "
              f"gap  [NOT erasable by interconnect; shrink via deeper "
              f"partition]")
        print(f"  remaining (host contention, pack/unpack, phase "
              f"imbalance): {other:.3f}s  "
              f"[rig-bound: oversubscribed {ncpu}-core scheduling]")
    print(json.dumps({"fixture": f"anchored_forest({a.scale})",
                      "cpu_cores": ncpu, "rows": rows}))


if __name__ == "__main__":
    main()
