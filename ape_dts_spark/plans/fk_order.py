"""Foreign-key-aware apply ordering.

The reference carries ``foreign_keys`` in every table's metadata
(dt-common/src/meta/rdb_tb_meta.rs:11-23) and, when FK constraints are
active on the target, drops to the serial parallelizer so parent rows land
before child rows (dt-task parallelizer selection; SURVEY §2.6
SerialParallelizer). Full-table serialization is the sledgehammer: the
correct constraint is only a *partial order over tables* — a child table
must apply after every table it references. This module computes that order
so the task engine can keep intra-table parallelism and only sequence the
table *stages*:

- inserts/upserts apply in ascending ``fk_level`` (parents first),
- deletes apply in descending ``fk_level`` (children first),
- tables in the same level run fully parallel.

FK graphs are metadata (tens to thousands of tables, never rows), so the
longest-path computation is plain driver-side Python — the same altitude the
reference keeps its metadata at. Cycles (legal in SQL via self-references or
mutual FKs) are reported so the caller can fall back to serial apply for the
strongly-connected tables only.
"""

from __future__ import annotations

# TPC-H-ish FK edges over the driver's test tables: (child, parent).
TPCH_FK_EDGES: list[tuple[str, str]] = [
    ("nation", "region"),
    ("customer", "nation"),
    ("supplier", "nation"),
    ("orders", "customer"),
    ("lineitem", "orders"),
    ("lineitem", "part"),
    ("lineitem", "supplier"),
]


def parse_fk_spec(fk_spec: str) -> list[tuple[str, str]]:
    """Parse a ``child:parent,child:parent`` config string into edges,
    stripping whitespace on BOTH sides of each colon. task.py and
    precheck.check_fk_config share this parser — they used to disagree
    ("orders: customer" passed precheck but produced a phantom ' customer'
    parent at apply staging, silently dropping the edge constraint)."""
    edges = []
    for part in filter(None, (p.strip() for p in fk_spec.split(","))):
        if ":" not in part:
            continue
        child, parent = (s.strip() for s in part.split(":", 1))
        if child and parent:
            edges.append((child, parent))
    return edges


def fk_levels(
    tables: list[str], edges: list[tuple[str, str]]
) -> tuple[dict[str, int], list[str]]:
    """Longest-path FK level per table (Kahn's algorithm).

    Returns ``(levels, cyclic)``: level 0 = references nothing; a child's
    level is 1 + max(parent levels). ``cyclic`` lists tables stuck in or
    downstream of a reference cycle (never assigned a level); callers apply
    those serially.
    """
    tabs = set(tables) | {t for e in edges for t in e}
    parents: dict[str, set[str]] = {t: set() for t in tabs}
    children: dict[str, set[str]] = {t: set() for t in tabs}
    for child, parent in edges:
        if child != parent:  # self-reference orders rows, not tables
            parents[child].add(parent)
            children[parent].add(child)

    levels: dict[str, int] = {}
    ready = sorted(t for t in tabs if not parents[t])
    frontier = [(t, 0) for t in ready]
    while frontier:
        tb, lv = frontier.pop()
        levels[tb] = max(levels.get(tb, 0), lv)
        for ch in children[tb]:
            parents[ch].discard(tb)
            if not parents[ch]:
                frontier.append((ch, levels[tb] + 1))
            else:
                # longest-path: remember the best lower bound seen so far
                frontier_lv = levels.get(ch, 0)
                if levels[tb] + 1 > frontier_lv:
                    levels[ch] = levels[tb] + 1
    cyclic = sorted(t for t in tabs if parents[t])
    for t in cyclic:
        levels.pop(t, None)
    return levels, cyclic


def apply_stages(
    tables: list[str], edges: list[tuple[str, str]], deletes_first: bool = False
) -> list[list[str]]:
    """Stage plan: list of table groups; groups run in order, tables inside a
    group in parallel. ``deletes_first=True`` reverses for delete batches."""
    levels, cyclic = fk_levels(tables, edges)
    if cyclic:
        raise ValueError(f"FK cycle involving tables: {cyclic}")
    by_level: dict[int, list[str]] = {}
    for tb, lv in levels.items():
        by_level.setdefault(lv, []).append(tb)
    stages = [sorted(by_level[lv]) for lv in sorted(by_level)]
    return stages[::-1] if deletes_first else stages
