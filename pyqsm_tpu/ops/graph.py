"""Graph kernels: Borůvka MST + degree-2 chain contraction.

Replaces mistree's C MST (``skeletonize.py:36-55``) and the O(V²) pure-python
degree-2 fusion of ``simplify_graph`` (``skeletonize.py:57-98``) with
device-parallel equivalents:

- **Borůvka MST** over the kNN edge list: each round every component picks
  its minimum outgoing edge (segment-min with index tie-break) and merges via
  pointer jumping — ≤ log₂N rounds of O(E) work.
- **Chain contraction**: connected components over interior (deg2–deg2)
  edges identify each maximal chain of degree-2 vertices; every chain becomes
  one simplified edge between its two junction attachments, and the chain id
  per vertex is returned so per-edge statistics (mean contraction → cylinder
  radius, ``skeletonize.py:402-407``) are one segment-mean away.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array
_BIG = jnp.int32(2**30)


def _pointer_jump(parent: Array, rounds: int = 32) -> Array:
    """Fully collapse a parent forest (parent[i] <= i) to roots."""

    def cond(state):
        p, changed, it = state
        return changed & (it < rounds)

    def body(state):
        p, _, it = state
        p2 = p[p]
        return p2, jnp.any(p2 != p), it + 1

    p, _, _ = jax.lax.while_loop(cond, body, (parent, jnp.array(True), jnp.int32(0)))
    return p


@partial(jax.jit, static_argnames=("max_rounds",))
def boruvka_mst(
    nbr_idx: Array,  # [N, k] candidate edges (directed kNN), -1 padded
    nbr_dist: Array,  # [N, k]
    node_mask: Array,  # [N]
    max_rounds: int = 32,
) -> tuple[Array, Array, Array, Array]:
    """MST (forest, if disconnected) over the symmetric closure of the kNN
    graph. Returns ``(edge_u [E], edge_v [E], selected [E] bool, comp [N])``
    where E = N·k flattened candidates and ``comp`` is the final component
    label per node."""
    n, k = nbr_idx.shape
    e = n * k
    u = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    v = nbr_idx.reshape(-1)
    w = nbr_dist.reshape(-1)
    edge_live = (v >= 0) & node_mask[u] & node_mask[jnp.maximum(v, 0)]
    v = jnp.maximum(v, 0)
    w = jnp.where(edge_live, w, jnp.inf)
    eidx = jnp.arange(e, dtype=jnp.int32)

    comp0 = jnp.where(node_mask, jnp.arange(n, dtype=jnp.int32), _BIG)
    selected0 = jnp.zeros(e, dtype=bool)

    def cond(state):
        comp, selected, any_active, it = state
        return any_active & (it < max_rounds)

    def body(state):
        comp, selected, _, it = state
        cu, cv = comp[u], comp[v]
        active = edge_live & (cu != cv)
        wa = jnp.where(active, w, jnp.inf)
        # min weight per component (edge usable by both endpoint components)
        minw = jnp.full(n + 1, jnp.inf)
        cu_s = jnp.where(active, cu, n)
        cv_s = jnp.where(active, cv, n)
        minw = minw.at[cu_s].min(wa, mode="drop")
        minw = minw.at[cv_s].min(wa, mode="drop")
        # tie-break by edge index among weight-minimal edges
        is_min_u = active & (wa == minw[cu_s])
        is_min_v = active & (wa == minw[cv_s])
        mine = jnp.full(n + 1, _BIG)
        mine = mine.at[jnp.where(is_min_u, cu_s, n)].min(eidx, mode="drop")
        mine = mine.at[jnp.where(is_min_v, cv_s, n)].min(eidx, mode="drop")
        chosen_for_u = is_min_u & (eidx == mine[cu_s])
        chosen_for_v = is_min_v & (eidx == mine[cv_s])
        chosen = chosen_for_u | chosen_for_v
        selected = selected | chosen
        # union: hook larger root to smaller, then pointer jump
        parent = jnp.arange(n, dtype=jnp.int32)
        a = jnp.where(chosen, jnp.minimum(cu, cv), 0)
        b = jnp.where(chosen, jnp.maximum(cu, cv), 0)
        parent = parent.at[jnp.where(chosen, b, n)].min(a, mode="drop")
        parent = _pointer_jump(parent)
        comp_new = jnp.where(node_mask, parent[jnp.clip(comp, 0, n - 1)], comp)
        any_active = jnp.any(active)
        return comp_new, selected, any_active, it + 1

    comp, selected, _, _ = jax.lax.while_loop(
        cond, body, (comp0, selected0, jnp.array(True), jnp.int32(0))
    )
    return u, v, selected, comp


@partial(jax.jit, static_argnames=("n", "max_rounds"))
def _edge_cc(
    n: int, eu: Array, ev: Array, edge_mask: Array, node_active: Array,
    max_rounds: int = 64,
) -> Array:
    """Connected components over an edge list restricted to active nodes."""
    labels0 = jnp.where(node_active, jnp.arange(n, dtype=jnp.int32), _BIG)
    use = edge_mask & node_active[eu] & node_active[ev]
    us = jnp.where(use, eu, n)
    vs = jnp.where(use, ev, n)

    def cond(state):
        lab, changed, it = state
        return changed & (it < max_rounds)

    def body(state):
        lab, _, it = state
        lu = lab[jnp.clip(eu, 0, n - 1)]
        lv = lab[jnp.clip(ev, 0, n - 1)]
        m = jnp.minimum(lu, lv)
        new = lab.at[us].min(jnp.where(use, m, _BIG), mode="drop")
        new = new.at[vs].min(jnp.where(use, m, _BIG), mode="drop")
        safe = jnp.clip(new, 0, n - 1)
        jumped = jnp.where(new < _BIG, jnp.minimum(new, new[safe]), new)
        return jumped, jnp.any(jumped != lab), it + 1

    lab, _, _ = jax.lax.while_loop(
        cond, body, (labels0, jnp.array(True), jnp.int32(0))
    )
    return lab


class SimplifiedGraph(NamedTuple):
    """Degree-2-contracted skeleton graph.

    Simplified edge list is sized [N + E_direct_cap] padded with mask. Each
    vertex of the input graph carries ``chain_id`` (-1 for junctions) so
    per-edge member statistics are segment reductions keyed by chain id.
    """

    edge_u: Array  # [M] i32 junction endpoints
    edge_v: Array  # [M]
    edge_mask: Array  # [M]
    edge_chain: Array  # [M] i32 chain id of the edge's interior (-1 = direct edge)
    chain_id: Array  # [N] i32 per input vertex (-1 for junctions/dead)
    degree: Array  # [N]
    is_junction: Array  # [N] bool (degree != 2, live)


@jax.jit
def simplify_degree2(
    eu: Array, ev: Array, edge_mask: Array, node_mask: Array
) -> SimplifiedGraph:
    """Contract all maximal chains of degree-2 vertices into single edges
    (reference ``simplify_graph``, ``skeletonize.py:57-98``)."""
    n = node_mask.shape[0]
    deg = jnp.zeros(n, jnp.int32)
    us = jnp.where(edge_mask, eu, n)
    vs = jnp.where(edge_mask, ev, n)
    deg = deg.at[us].add(1, mode="drop")
    deg = deg.at[vs].add(1, mode="drop")
    live = node_mask & (deg > 0)
    is_j = live & (deg != 2)
    is_c = live & (deg == 2)

    # chains = CC over interior edges (both endpoints degree-2)
    interior = edge_mask & is_c[jnp.clip(eu, 0, n - 1)] & is_c[jnp.clip(ev, 0, n - 1)]
    chain = _edge_cc(n, eu, ev, interior, is_c)
    chain_id = jnp.where(is_c, chain, -1)

    # attachment edges: one junction endpoint, one chain endpoint
    u_j = is_j[jnp.clip(eu, 0, n - 1)]
    v_j = is_j[jnp.clip(ev, 0, n - 1)]
    attach = edge_mask & (u_j ^ v_j)
    j_node = jnp.where(u_j, eu, ev)
    c_node = jnp.where(u_j, ev, eu)
    c_chain = jnp.where(attach, chain_id[jnp.clip(c_node, 0, n - 1)], -1)

    # per chain: the two junction attachments (min/max junction node id;
    # in a tree a chain cannot attach twice to the same junction)
    jmin = jnp.full(n + 1, _BIG)
    jmax = jnp.full(n + 1, -1, jnp.int32)
    key = jnp.where(attach & (c_chain >= 0), c_chain, n)
    jmin = jmin.at[key].min(jnp.where(attach, j_node, _BIG), mode="drop")
    jmax = jmax.at[key].max(jnp.where(attach, j_node, -1), mode="drop")

    # one simplified edge per chain (indexed by chain root id)
    chain_ids = jnp.arange(n, dtype=jnp.int32)
    chain_exists = (jmin[:n] < _BIG) & (jmax[:n] >= 0)
    ce_u = jnp.where(chain_exists, jmin[:n], 0)
    ce_v = jnp.where(chain_exists, jmax[:n], 0)

    # direct junction-junction edges pass through unchanged
    direct = edge_mask & u_j & v_j
    out_u = jnp.concatenate([ce_u, jnp.where(direct, eu, 0)])
    out_v = jnp.concatenate([ce_v, jnp.where(direct, ev, 0)])
    out_m = jnp.concatenate([chain_exists, direct])
    out_c = jnp.concatenate([jnp.where(chain_exists, chain_ids, -1),
                             jnp.full(eu.shape[0], -1, jnp.int32)])
    return SimplifiedGraph(out_u, out_v, out_m, out_c, chain_id, deg, is_j)
