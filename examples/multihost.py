"""Multi-host distributed solve example.

Spawns 2 localhost CPU processes that jointly solve a 12-branch anchored
forest (the multi-session SLAM shape: one shared anchor, independent
mapping sessions below it), then re-solve incrementally after growing one
branch — the distribution axis the reference reaches with
``addprocs(2)`` + ``solveTree!(…; multiproc=true)``
(test/testMultiprocess.jl:4-13), here as subtree partition + collective
message exchange (parallel/multihost.py).

Run: PYTHONPATH=.:$PYTHONPATH python examples/multihost.py
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from incrementalinference.jl_tpu.parallel.multihost import launch_multihost


def main():
    print("launching 2 processes x 2 virtual devices (gloo collectives)…")
    reps = launch_multihost(2, "anchored_forest", scale=12,
                            devices_per_proc=2, grow=3, timeout=900)
    for r in reps:
        w = r["warm"]
        print(f"process {r['pid']}: {w['n_cliques']} cliques, "
              f"warm solve {w['timings']['total_s']:.2f}s "
              f"(local up {w['timings']['local_up_s']:.2f}s, "
              f"exchange {w['timings']['exchange_up_s']*1e3:.0f}ms), "
              f"max err {w['max_err']:.3f}")
        i = r["incr"]
        print(f"  incremental re-solve (+3 poses): "
              f"{i['timings']['total_s']:.2f}s, "
              f"{i['n_recycled']}/{i['n_cliques']} cliques recycled, "
              f"max err {i['max_err']:.3f}")
    assert abs(reps[0]["warm"]["max_err"] - reps[1]["warm"]["max_err"]) < 1e-6
    print("both processes hold the identical full posterior ✓")

    print("\nparametric variant (Gaussian cut messages):")
    reps = launch_multihost(2, "anchored_forest", scale=12,
                            devices_per_proc=1, algorithm="parametric",
                            timeout=900)
    for r in reps:
        print(f"process {r['pid']}: warm "
              f"{r['warm']['timings']['total_s']:.2f}s, "
              f"max err {r['warm']['max_err']:.3f}")


if __name__ == "__main__":
    main()
