"""Cross-conversation entity canonicalization: MinHash/LSH + clustering.

Generalizes the reference's tag canonicalizer (cluster seeds + nearest-form
assignment + shortest-then-lexicographic renaming, ``reduce_entities.py:88-117``)
to entity surface forms at scale: LSH blocking over MinHash signatures of char
3-shingles, exact-Jaccard pair verification inside blocks, connected
components, and a deterministic canonical representative per component
(min by (len, lex) — the same rule as ``reduce_entities.py:110-115``).

The functions here define the *semantics*; ``stages/canonicalize.py`` runs the
same steps distributed (map_batches signatures -> groupby(band) candidate
pairs -> min-label-propagation components), and must produce identical
cluster assignments because components and the min-rep rule are order-free.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Iterable, List, Sequence, Set, Tuple

from .hashing import MinHasher, char_shingles, jaccard

DEFAULT_NUM_PERM = 64
DEFAULT_BANDS = 16
DEFAULT_THRESHOLD = 0.5
SHINGLE_K = 3


def surface_band_keys(
    norm: str, hasher: MinHasher, bands: int = DEFAULT_BANDS
) -> List[str]:
    return hasher.band_keys(hasher.signature(char_shingles(norm, SHINGLE_K)), bands)


def verify_pair(a: str, b: str, threshold: float = DEFAULT_THRESHOLD) -> bool:
    return jaccard(char_shingles(a, SHINGLE_K), char_shingles(b, SHINGLE_K)) >= threshold


def candidate_pairs_from_blocks(
    blocks: Iterable[Sequence[str]],
) -> Set[Tuple[str, str]]:
    """All within-block pairs, ordered (min, max) — dedup across blocks."""
    pairs: Set[Tuple[str, str]] = set()
    for members in blocks:
        uniq = sorted(set(members))
        for i in range(len(uniq)):
            for j in range(i + 1, len(uniq)):
                pairs.add((uniq[i], uniq[j]))
    return pairs


def connected_components(
    nodes: Iterable[str], edges: Iterable[Tuple[str, str]]
) -> Dict[str, str]:
    """Union-find components; returns node -> component representative where
    the representative is the (len, lex)-minimal member (deterministic,
    independent of edge order)."""
    parent: Dict[str, str] = {n: n for n in nodes}

    def find(x: str) -> str:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comps: Dict[str, List[str]] = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    out: Dict[str, str] = {}
    for members in comps.values():
        rep = min(members, key=lambda m: (len(m), m))
        for m in members:
            out[m] = rep
    return out


def cluster_surfaces(
    norms: Sequence[str],
    threshold: float = DEFAULT_THRESHOLD,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
) -> Dict[str, str]:
    """Single-process reference clustering: norm -> canonical norm.

    The golden semantics for the distributed canonicalization stage.
    """
    hasher = MinHasher(num_perm)
    blocks: Dict[str, List[str]] = {}
    uniq = sorted(set(norms))
    for norm in uniq:
        for key in surface_band_keys(norm, hasher, bands):
            blocks.setdefault(key, []).append(norm)
    pairs = candidate_pairs_from_blocks(blocks.values())
    verified = [(a, b) for a, b in sorted(pairs) if verify_pair(a, b, threshold)]
    return connected_components(uniq, verified)


def canonical_entity_id(canonical_norm: str) -> str:
    """Stable opaque id for a canonical surface form."""
    return "ent_" + hashlib.blake2b(
        canonical_norm.encode("utf-8"), digest_size=8
    ).hexdigest()
