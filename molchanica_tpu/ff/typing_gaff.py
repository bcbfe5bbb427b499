"""GAFF2 atom typing from element + connectivity (Antechamber-style).

Reference surface: `find_ff_types` ("GAFF2 atom-typing a la Antechamber",
SURVEY.md §2.1). This is a rule-based subset covering mainstream organic
chemistry; exotic types (cc/cd/ce/cf conjugation splits, cp/cq biphenyl,
nb/nc/nd pyridine splits) fold into their parent classes (ca/n2/na), which
pairs with the built-in parameter subset's coverage.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple


def _ring_info(n_atoms: int, adj: List[List[int]]):
    """Smallest-ring membership (<= 6) per atom via BFS; aromatic detection
    is done separately from hybridization."""
    in_ring = [False] * n_atoms
    ring_size = [0] * n_atoms
    for start in range(n_atoms):
        # BFS for shortest cycle through `start`
        for first in adj[start]:
            prev = {start: -1, first: start}
            queue = [(first, 1)]
            found = 0
            while queue:
                node, d = queue.pop(0)
                if d > 6:
                    break
                for nb in adj[node]:
                    if nb == prev.get(node):
                        continue
                    if nb == start and d >= 2:
                        found = d + 1
                        queue = []
                        break
                    if nb not in prev:
                        prev[nb] = node
                        queue.append((nb, d + 1))
            if found:
                in_ring[start] = True
                if ring_size[start] == 0 or found < ring_size[start]:
                    ring_size[start] = found
                break
    return in_ring, ring_size


def assign_gaff_types(
    elements: Sequence[str],
    bonds: Sequence[Tuple[int, int]],
    bond_orders: Sequence[float] = None,
) -> List[str]:
    """Assign GAFF-family types. bond_orders: 1/2/3/1.5 per bond (defaults
    to 1 everywhere, with aromaticity inferred from 6-rings of sp2 carbon
    when orders are absent)."""
    n = len(elements)
    adj: List[List[int]] = [[] for _ in range(n)]
    order_of = {}
    for bi, (i, j) in enumerate(bonds):
        adj[i].append(j)
        adj[j].append(i)
        o = 1.0 if bond_orders is None else float(bond_orders[bi])
        order_of[(i, j)] = order_of[(j, i)] = o

    el = [e.capitalize() for e in elements]
    deg = [len(a) for a in adj]
    in_ring, ring_size = _ring_info(n, adj)

    def max_order(i):
        return max((order_of[(i, j)] for j in adj[i]), default=1.0)

    def has_nb_el(i, symbol, min_order=0.0):
        return any(el[j] == symbol and order_of[(i, j)] >= min_order
                   for j in adj[i])

    def aromatic(i):
        # bond-order 1.5 marks aromatic directly; otherwise: carbon in a
        # 6-ring (or 5-ring) where every ring-adjacent atom has degree <= 3
        if any(abs(order_of[(i, j)] - 1.5) < 0.01 for j in adj[i]):
            return True
        if bond_orders is not None:
            return False
        if el[i] == "C" and in_ring[i] and ring_size[i] in (5, 6) \
                and deg[i] == 3:
            ring_nbrs = [j for j in adj[i] if in_ring[j]]
            return all(deg[j] <= 3 for j in ring_nbrs)
        return False

    types = [""] * n
    # pass 1: heavy atoms
    for i in range(n):
        e = el[i]
        if e == "C":
            if aromatic(i):
                types[i] = "ca"
            elif max_order(i) >= 3.0 or (deg[i] == 2 and max_order(i) >= 2.0
                                         and all(order_of[(i, j)] >= 2.0
                                                 for j in adj[i])):
                types[i] = "c1"
            elif has_nb_el(i, "O", 2.0) or has_nb_el(i, "S", 2.0):
                types[i] = "c"     # carbonyl / thiocarbonyl carbon
            elif max_order(i) >= 2.0:
                types[i] = "c2"
            elif bond_orders is None and deg[i] == 3:
                # heuristic sp2: 3 neighbors, no H to spare — keep sp3 unless
                # doubly-bonded O present (carbonyl heuristic by geometry is
                # not available here)
                types[i] = "c3"
            else:
                types[i] = "c3"
        elif e == "N":
            if aromatic(i) or (in_ring[i] and ring_size[i] in (5, 6)
                               and deg[i] <= 3 and bond_orders is None
                               and any(types[j] == "ca" for j in adj[i])):
                types[i] = "na" if deg[i] == 3 else "nb"
            elif max_order(i) >= 3.0:
                types[i] = "n1"
            elif max_order(i) >= 2.0:
                types[i] = "n2"
            elif deg[i] == 4:
                types[i] = "n4"
            elif any(el[j] == "C" and has_nb_el(j, "O", 2.0) for j in adj[i]):
                types[i] = "n"     # amide
            elif any(aromatic(j) for j in adj[i]):
                types[i] = "nh"    # aniline-type
            elif any(el[j] == "O" and order_of[(i, j)] >= 2.0 for j in adj[i]) \
                    and sum(el[j] == "O" for j in adj[i]) >= 2:
                types[i] = "no"    # nitro
            else:
                types[i] = "n3"    # amine
        elif e == "O":
            if max_order(i) >= 2.0 or deg[i] == 1 and any(
                    el[j] in ("C", "N", "P", "S") and deg[j] >= 3
                    and sum(el[k] == "O" and deg[k] == 1 for k in adj[j]) >= 2
                    for j in adj[i]):
                types[i] = "o"     # carbonyl / oxo / carboxylate
            elif any(el[j] == "H" for j in adj[i]):
                types[i] = "oh"
            elif deg[i] == 1:
                types[i] = "o"
            else:
                types[i] = "os"
        elif e == "S":
            if max_order(i) >= 2.0 and deg[i] <= 1:
                types[i] = "s2"
            elif deg[i] == 4 or sum(el[j] == "O" and deg[j] == 1
                                    for j in adj[i]) >= 2:
                types[i] = "s6"    # sulfone/sulfate
            elif deg[i] == 3:
                types[i] = "s4"    # sulfoxide
            elif any(el[j] == "H" for j in adj[i]):
                types[i] = "sh"
            else:
                types[i] = "ss"
        elif e == "P":
            types[i] = "p5"
        elif e in ("F", "Cl", "Br", "I"):
            types[i] = e.lower()
        elif e == "H":
            pass   # second pass
        else:
            types[i] = e.lower()

    # nb (aromatic N, no H) folds to n2 params in the subset; keep type name
    # pass 2: hydrogens by attached heavy atom + electron-withdrawal count
    for i in range(n):
        if el[i] != "H":
            continue
        if not adj[i]:
            types[i] = "hc"
            continue
        j = adj[i][0]
        ej = el[j]
        if ej == "O":
            types[i] = "ho"
        elif ej == "N":
            types[i] = "hn"
        elif ej == "S":
            types[i] = "hs"
        elif ej == "P":
            types[i] = "hp"
        elif ej == "C":
            ew = sum(1 for k in adj[j]
                     if el[k] in ("N", "O", "F", "Cl", "Br", "S"))
            if types[j] == "ca":
                types[i] = "h4" if ew >= 1 else "ha"
            elif types[j] in ("c2", "c1", "c"):
                types[i] = "ha" if ew == 0 else "h4"
            else:
                types[i] = {0: "hc", 1: "h1", 2: "h2", 3: "h3"}.get(ew, "h3")
        else:
            types[i] = "hc"
    return types
