"""Matroid constraints (SURVEY.md §2.1 / PAPER-KDD18).

Driver-side independence oracles used by the constrained local search;
the *distributed* part of matroid-constrained diversity is delegate
selection (a windowed top-m per (cluster, category) — see
queries.div_matroid_partition), which preserves an independent set
inside the coreset per the KDD18 composable-coreset argument.
"""

from __future__ import annotations

import numpy as np


class PartitionMatroid:
    """Independent iff, per category, #selected <= capacity."""

    def __init__(self, capacities: dict[int, int]):
        self.capacities = capacities

    def is_independent(self, labels) -> bool:
        labels = np.asarray(labels)
        for lab in np.unique(labels):
            if int((labels == lab).sum()) > self.capacities.get(int(lab), 0):
                return False
        return True


class TransversalMatroid:
    """Ground element i covers topic set topics[i] ⊆ T; a set S is
    independent iff S has a perfect matching into distinct topics
    (bipartite matching via augmenting paths — S is always small)."""

    def __init__(self, topics: dict[int, frozenset]):
        self.topics = topics

    def is_independent(self, elements) -> bool:
        elements = list(elements)
        match: dict = {}  # topic -> element

        def try_assign(e, seen) -> bool:
            for t in sorted(self.topics.get(e, frozenset())):
                if t in seen:
                    continue
                seen.add(t)
                if t not in match or try_assign(match[t], seen):
                    match[t] = e
                    return True
            return False

        for e in elements:
            if not try_assign(e, set()):
                return False
        return True
