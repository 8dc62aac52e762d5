"""Driver-side graph utilities: topological write order + components.

Mirrors the reference's dependency handling (etielle/utils.py:6-141): child
tables depend on their link_to parents; writes flush parents first.  This is
pure driver-side planning (tiny graphs), so plain Python is the right tool —
the data itself never touches these structures.
"""

from __future__ import annotations


def topological_order(nodes: set[str], child_to_parents: dict[str, set[str]]) -> list[str]:
    """Deterministic Kahn's algorithm, parents first.

    Reference: etielle/utils.py:6-54 (sorted queue for determinism; cycle
    detection raises).
    """
    parents_of = {n: set(child_to_parents.get(n, set())) & nodes for n in nodes}
    children_of: dict[str, set[str]] = {n: set() for n in nodes}
    for child, parents in parents_of.items():
        for p in parents:
            children_of[p].add(child)
    ready = sorted(n for n in nodes if not parents_of[n])
    order: list[str] = []
    remaining = dict(parents_of)
    while ready:
        n = ready.pop(0)
        order.append(n)
        for c in sorted(children_of[n]):
            remaining[c].discard(n)
            if not remaining[c] and c not in order and c not in ready:
                if all(p in order for p in parents_of[c]):
                    ready.append(c)
        ready.sort()
    if len(order) != len(nodes):
        cyclic = sorted(nodes - set(order))
        raise ValueError(f"Dependency cycle among tables: {cyclic}")
    return order


def connected_components(nodes: set[str], edges: set[tuple[str, str]]) -> list[list[str]]:
    """Weakly connected components, deterministically ordered.

    Reference: etielle/utils.py:57-141.  In the Spark engine these matter
    only as write-ordering groups (memory eviction is Spark's job).
    """
    adj: dict[str, set[str]] = {n: set() for n in nodes}
    for a, b in edges:
        if a in adj and b in adj:
            adj[a].add(b)
            adj[b].add(a)
    seen: set[str] = set()
    comps: list[list[str]] = []
    for n in sorted(nodes):
        if n in seen:
            continue
        stack, comp = [n], []
        while stack:
            cur = stack.pop()
            if cur in seen:
                continue
            seen.add(cur)
            comp.append(cur)
            stack.extend(sorted(adj[cur] - seen))
        comps.append(sorted(comp))
    return comps
