"""Generate the acceptance-parity fixture from the REFERENCE implementation.

Runs the reference's `evaluate_posterior` (pipeline_utils.py:1345-1433) on
CPU torch over random trees/logits with fixed seeds and records its
decisions. The committed fixture (tests/fixtures/posterior_ref.npz) lets CI
assert, without any checkpoint, that:

- our greedy path matches the reference EXACTLY (best leaf, accept length,
  next-token argmax), and
- our stochastic path matches the reference's acceptance LAW (accept-length
  distribution over many RNG trials on identical logits) — per-trial draws
  cannot match across torch-global-RNG vs jax PRNG.

Requires the reference checkout (read-only) at /root/reference; only its
runtime behavior is recorded, no code is copied.

Usage: python tools/make_posterior_fixture.py [out.npz]
"""

import os
import random
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
REF = os.environ.get("FLOWSPEC_REFERENCE", "/root/reference")

N_TREES = 20
N_STOCH_TREES = 4
N_TRIALS = 2000
VOCAB = 40


def random_tree_arrays(rng, n, branch=3):
    """(tokens, parents) in BFS order with random branching."""
    parents = [-1]
    for i in range(1, n):
        parents.append(rng.integers(max(0, i - 2 * branch), i))
    tokens = rng.integers(0, VOCAB, n)
    return np.asarray(tokens, np.int64), np.asarray(parents, np.int64)


def retrieve_of(parents):
    n = len(parents)
    has_child = np.zeros(n, bool)
    has_child[[p for p in parents[1:] if p >= 0]] = True
    rows = []
    for leaf in range(n):
        if has_child[leaf]:
            continue
        path = [leaf]
        while parents[path[-1]] != -1:
            path.append(parents[path[-1]])
        rows.append(path[::-1])
    depth = max(len(r) for r in rows)
    out = -np.ones((len(rows), depth), np.int64)
    for i, r in enumerate(rows):
        out[i, :len(r)] = r
    return out


def main(out_path=None):
    sys.path.insert(0, REF)
    import torch
    from pipeline_utils import evaluate_posterior, prepare_logits_processor

    out_path = out_path or os.path.join(
        _ROOT, "tests", "fixtures", "posterior_ref.npz")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    rng = np.random.default_rng(0)
    data = {}

    # ---- greedy cases ----------------------------------------------------
    for t in range(N_TREES):
        n = int(rng.integers(6, 24))
        tokens, parents = random_tree_arrays(rng, n)
        ri = retrieve_of(parents)
        node_logits = rng.normal(size=(n, VOCAB)).astype(np.float32)
        # bias logits toward tree tokens on some nodes so acceptance happens
        for i in range(n):
            if rng.random() < 0.6:
                kids = [j for j in range(n) if parents[j] == i]
                if kids:
                    node_logits[i, tokens[rng.choice(kids)]] += 6.0

        cand = np.where(ri >= 0, tokens[np.clip(ri, 0, n - 1)], -1)
        gathered = node_logits[np.clip(ri, 0, n - 1)]  # (L, D, V)
        best, acc, row = evaluate_posterior(
            torch.from_numpy(gathered), torch.from_numpy(cand), None)
        data[f"g{t}_tokens"] = tokens
        data[f"g{t}_parents"] = parents
        data[f"g{t}_logits"] = node_logits
        data[f"g{t}_best"] = np.asarray(int(best))
        data[f"g{t}_accept"] = np.asarray(int(acc))
        data[f"g{t}_next_argmax"] = np.asarray(
            int(np.argmax(row.numpy())))
    data["n_greedy"] = np.asarray(N_TREES)

    # ---- stochastic cases: accept-length law over many trials ------------
    for t in range(N_STOCH_TREES):
        n = int(rng.integers(8, 20))
        tokens, parents = random_tree_arrays(rng, n)
        ri = retrieve_of(parents)
        node_logits = rng.normal(size=(n, VOCAB)).astype(np.float32) * 1.5
        for i in range(n):
            kids = [j for j in range(n) if parents[j] == i]
            if kids and rng.random() < 0.7:
                node_logits[i, tokens[rng.choice(kids)]] += 3.0
        cand = np.where(ri >= 0, tokens[np.clip(ri, 0, n - 1)], -1)
        gathered = node_logits[np.clip(ri, 0, n - 1)]
        proc = prepare_logits_processor(temperature=1.0)

        accs = np.zeros(N_TRIALS, np.int64)
        bests = np.zeros(N_TRIALS, np.int64)
        for s in range(N_TRIALS):
            # decorrelate seeds (sequential-integer seeding gave a visibly
            # biased first-draw sample at 600 trials); str hash() would be
            # PYTHONHASHSEED-dependent, so mix numerically
            random.seed(((t * 1_000_003 + s) * 2654435761) % (1 << 31))
            best, acc, _ = evaluate_posterior(
                torch.from_numpy(gathered.copy()),
                torch.from_numpy(cand), proc)
            accs[s] = int(acc)
            bests[s] = int(best)
        data[f"s{t}_tokens"] = tokens
        data[f"s{t}_parents"] = parents
        data[f"s{t}_logits"] = node_logits
        data[f"s{t}_accepts"] = accs
        data[f"s{t}_bests"] = bests
    data["n_stoch"] = np.asarray(N_STOCH_TREES)
    data["n_trials"] = np.asarray(N_TRIALS)
    data["vocab"] = np.asarray(VOCAB)

    np.savez_compressed(out_path, **data)
    print(f"wrote {out_path}: {N_TREES} greedy trees, "
          f"{N_STOCH_TREES} stochastic trees x {N_TRIALS} trials")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
