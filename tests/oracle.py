"""Naive NumPy oracles mirroring the reference's dynamic-shape tree algebra.

Each function re-implements the corresponding reference routine as literally
as practical (dicts, python loops, dynamic shapes) so the static-shape JAX
versions in flowspec_tpu.tree can be property-tested against them.
Reference citations are per-function.
"""

from __future__ import annotations

import numpy as np


class NaiveTree:
    """Dynamic-shape tree: tokens (n,), parents (n,) with parent[0] = -1."""

    def __init__(self, tokens, parents, scores=None):
        self.tokens = np.asarray(tokens, np.int64)
        self.parents = np.asarray(parents, np.int64)
        self.scores = (np.asarray(scores, np.float64) if scores is not None
                       else np.zeros_like(self.tokens, np.float64))
        assert self.parents[0] == -1
        for i in range(1, len(self.parents)):
            assert 0 <= self.parents[i] < i, "BFS order required"

    @property
    def n(self):
        return len(self.tokens)

    def depth(self):
        d = np.zeros(self.n, np.int64)
        for i in range(1, self.n):
            d[i] = d[self.parents[i]] + 1
        return d

    def ancestor_mask(self):
        """Ref: the tree_mask build loop, eagle/cnets.py:920-925."""
        m = np.eye(self.n, dtype=bool)
        for i in range(1, self.n):
            m[i] |= m[self.parents[i]]
        return m

    def path_to(self, i):
        """Node ids root->i inclusive."""
        path = [i]
        while self.parents[path[-1]] != -1:
            path.append(self.parents[path[-1]])
        return path[::-1]

    def token_path(self, i):
        return tuple(self.tokens[j] for j in self.path_to(i))

    def leaves(self):
        has_child = np.zeros(self.n, dtype=bool)
        has_child[self.parents[1:]] = True
        return [i for i in range(self.n) if not has_child[i]]

    def retrieve(self):
        """Ref: the leaf walk, eagle/cnets.py:947-961 (natural index order)."""
        leaves = self.leaves()
        depth = self.depth()
        max_d = depth.max() + 1
        out = np.full((len(leaves), max_d), -1, np.int64)
        for r, leaf in enumerate(leaves):
            p = self.path_to(leaf)
            out[r, :len(p)] = p
        return out


def evaluate_posterior_greedy(node_logits, tree: NaiveTree):
    """Ref: pipeline_utils.py:1367-1382 on gathered (L, D) logits."""
    ri = tree.retrieve()
    L, D = ri.shape
    cand = np.where(ri >= 0, tree.tokens[np.clip(ri, 0, None)], -1)
    argmax = node_logits.argmax(-1)
    lens = np.zeros(L, np.int64)
    for l in range(L):
        for d in range(1, D):
            if ri[l, d] >= 0 and cand[l, d] == argmax[ri[l, d - 1]]:
                lens[l] += 1
            else:
                break
    accept_len = lens.max()
    best = 0 if accept_len == 0 else int(np.argmax(lens))
    last_node = ri[best, accept_len]
    p = _softmax(node_logits[last_node])
    return best, int(accept_len), p


def _softmax(x):
    x = x - x.max()
    e = np.exp(x)
    return e / e.sum()


def pruning_info(tree: NaiveTree, best_leaf, accept_len, sampled_token):
    """Ref: cal_pruning_info (pipeline_utils.py:944-991). accept_len includes
    the root. Returns (truncate, new_root, kept_ids ascending)."""
    ri = tree.retrieve()
    path = ri[best_leaf]
    if accept_len >= ri.shape[1] or path[accept_len] == -1:
        return True, -1, []
    last = path[accept_len - 1]
    children = [i for i in range(tree.n) if tree.parents[i] == last]
    match = [c for c in children if tree.tokens[c] == sampled_token]
    if not match:
        return True, -1, []
    new_root = match[0]
    anc = tree.ancestor_mask()
    kept = [i for i in range(tree.n) if anc[i, new_root]]
    return False, new_root, kept


def prune(tree: NaiveTree, new_root, kept):
    """Ref: draft_stage_pruning (pipeline_utils.py:995-1056)."""
    old2new = {o: i for i, o in enumerate(kept)}
    tokens = tree.tokens[kept]
    parents = np.array([-1] + [old2new[tree.parents[o]] for o in kept[1:]],
                       np.int64)
    scores = tree.scores[kept] - tree.scores[new_root]
    return NaiveTree(tokens, parents, scores)


def merge(tree1: NaiveTree, tree2: NaiveTree):
    """Ref: merge_two_tree (pipeline_utils.py:1176-1303) path-dict dedup."""
    paths1 = {tree1.token_path(i): i for i in range(tree1.n)}
    tokens = list(tree1.tokens)
    parents = list(tree1.parents)
    scores = list(tree1.scores)
    map2 = {}
    for i in range(tree2.n):
        tp = tree2.token_path(i)
        if tp in paths1:
            map2[i] = paths1[tp]
        else:
            map2[i] = len(tokens)
            tokens.append(tree2.tokens[i])
            parents.append(map2[tree2.parents[i]] if tree2.parents[i] != -1
                           else 0)
            scores.append(tree2.scores[i])
    return NaiveTree(tokens, parents, scores), map2


def partition_lengths(n_tokens, num_stages, chunk_len):
    """Ref: token_tree_partition (pipeline_utils.py:673-705) +
    split_close_equal (:136-146)."""
    if n_tokens // num_stages <= chunk_len:
        base, rem = divmod(n_tokens, num_stages)
        lens = [base + 1 if i < rem else base for i in range(num_stages)]
        lens.reverse()
        return lens
    return [chunk_len] * num_stages + [n_tokens - chunk_len * num_stages]


def cum_depths(retrieve, lens):
    """Ref: get_subseq_ri_cum_depths (pipeline_utils.py:718-740) CPU loop."""
    L = retrieve.shape[0]
    ri = np.concatenate([retrieve, np.full((L, 1), -1, np.int64)], axis=1)
    cum = np.cumsum(lens)
    d = np.zeros(L, np.int64)
    out = []
    for s, c in enumerate(cum):
        start = 0 if s == 0 else cum[s - 1]
        for j in range(start, c):
            leaves_at = ri[np.arange(L), d]
            d[leaves_at == j] += 1
        out.append(d.copy())
    return np.stack(out, axis=0)


def random_tree(rng: np.random.Generator, n_nodes, vocab=50, max_children=4):
    """Random BFS-ordered tree with sibling-unique tokens."""
    parents = [-1]
    tokens = [int(rng.integers(vocab))]
    scores = [0.0]
    for i in range(1, n_nodes):
        while True:
            p = int(rng.integers(max(1, i))) if i > 1 else 0
            if p >= i:
                continue
            sib_tokens = {tokens[j] for j in range(i) if parents[j] == p}
            if len(sib_tokens) >= vocab:
                continue
            t = int(rng.integers(vocab))
            if t not in sib_tokens:
                break
        parents.append(p)
        tokens.append(t)
        scores.append(scores[p] - float(rng.uniform(0.1, 2.0)))
    # BFS order requires parent < child; sort by depth then index.
    tree = NaiveTree(tokens, parents, scores)
    return tree
