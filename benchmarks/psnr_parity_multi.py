"""Multi-seed torch-vs-jax PSNR parity (VERDICT r3 #4: statistics, not n=1).

Runs benchmarks/psnr_parity.py's paired-training protocol over N seeds
(fresh inits + batch streams per seed, identical across frameworks within
a seed), then reports the SIGNED torch - jax delta with mean, std, and a
paired t confidence interval. The per-run protocol already decays lr 10x
across the horizon and averages val PSNR over a trailing eval window;
this driver lengthens the horizon so the within-run eval scatter is
small against the cross-seed spread it feeds.

    python benchmarks/psnr_parity_multi.py [n_seeds] [n_steps]

Writes benchmarks/results/psnr_parity_multi.json and prints a summary.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import psnr_parity

# two-sided 97.5% Student t quantiles for df = n - 1 (n seeds <= 10)
_T975 = {1: 12.706, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571,
         6: 2.447, 7: 2.365, 8: 2.306, 9: 2.262}


def main(n_seeds=5, n_steps=2500):
    runs = []
    for seed in range(n_seeds):
        print(f"[multi] seed {seed}...", file=sys.stderr, flush=True)
        r = psnr_parity.run(n_steps=n_steps, eval_every=250, eval_from=0.4,
                            seed=seed)
        if any(r["head_field_dead_torch_jax"]):
            # a dead head field (loss-basin artifact, hits both frameworks
            # together) cannot support a quality comparison; rerun with a
            # shifted seed and record the substitution
            print(f"[multi] seed {seed} dead "
                  f"{r['head_field_dead_torch_jax']}; substituting seed "
                  f"{seed + 100}", file=sys.stderr, flush=True)
            r = psnr_parity.run(n_steps=n_steps, eval_every=250,
                                eval_from=0.4, seed=seed + 100)
            r["substituted_for_dead_seed"] = seed
        runs.append(r)
        # incremental checkpoint: a partial artifact (n completed seeds so
        # far) survives a wall-clock cutoff; the final write replaces it
        _write(_summarize(runs, n_steps, partial=len(runs) < n_seeds))

    out = _summarize(runs, n_steps)
    _write(out)
    print(json.dumps({k: out[k] for k in
                      ("n_seeds", "delta_com_db", "delta_head_db")}))


def _summarize(runs, n_steps, partial=False):
    def stats(key_t, key_j):
        d = np.array([r[key_t] - r[key_j] for r in runs], np.float64)
        n = len(d)
        mean = d.mean()
        std = d.std(ddof=1) if n > 1 else 0.0
        half = _T975.get(n - 1, 1.96) * std / np.sqrt(n) if n > 1 else 0.0
        return dict(deltas=[round(x, 3) for x in d],
                    mean=round(float(mean), 3),
                    std=round(float(std), 3),
                    ci95=[round(float(mean - half), 3),
                          round(float(mean + half), 3)])

    out = {
        "n_seeds": len(runs),
        "n_steps": n_steps,
        "protocol": "paired seeds; torch - jax (negative = jax ahead); "
                    "trailing-window val PSNR means per run",
        "delta_com_db": stats("val_psnr_torch_com", "val_psnr_jax_com"),
        "delta_head_db": stats("val_psnr_torch_head", "val_psnr_jax_head"),
        "within_run_eval_std_com": [r["eval_std_com"] for r in runs],
        "per_seed": [
            {k: r[k] for k in (
                "seed", "val_psnr_torch_com", "val_psnr_jax_com",
                "val_psnr_torch_head", "val_psnr_jax_head",
                "abs_delta_com_db", "abs_delta_head_db",
                "max_rel_loss_divergence", "seconds")}
            for r in runs
        ],
    }
    if partial:
        out["partial"] = True
    return out


def _write(out):
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "results"), exist_ok=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "psnr_parity_multi.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[multi] wrote {path} (n={out['n_seeds']}"
          f"{', partial' if out.get('partial') else ''})", file=sys.stderr)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
