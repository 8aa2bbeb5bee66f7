"""COMPUTED driver-sample rotation (r15 verdict #1).

The external correctness tooling samples the FIRST 50 registered
queries each round, so the registration order is the repo's only lever
over driver coverage. Through round 15 that head (`_PRIORITY_50`) was a
hand-curated literal, and its narrative drifted from the committed
artifacts three ways in one round (STATUS said 18/12/~31 where the
samples said 7/36). This module derives the order from the
CORRECTNESS_r*.json history itself, so the staleness contract is
enforced by computation:

  1. never-green first (no green driver row in ANY committed sample —
     zero driver evidence is the biggest blind spot; this is exactly
     the new-this-round cohort plus anything whose sample ever failed),
     alphabetical;
  2. then the hand-declared changed-this-round list (a materially
     changed code path invalidates its old green row; this is the one
     input that cannot be derived from artifacts), alphabetical;
  3. then everything else by (oldest-green-round first, name) — the
     stale cohort drains strictly oldest-first, which is what keeps any
     query from exceeding the staleness ceiling while the head has
     room.

`gen_status.py` materializes the result into rotation_generated.py (the
literal entrypoints imports) and the STATUS rotation block;
tests/test_rotation.py pins committed == freshly computed.
"""

from __future__ import annotations

import glob
import json
import os
import re

STALENESS_CEILING = 6  # rounds a green row stays fresh (judge contract)


def _is_green(row) -> bool:
    """A driver row that counts as coverage: full three-way match, or
    the rows-only 'no_oracle' row which is the strongest row a
    non-SQL-expressible query can ever earn."""
    if not isinstance(row, dict):
        return False
    if row.get("err") == "no_oracle":
        return True
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
    )


def correctness_history(repo_root: str) -> tuple[dict[str, int], int]:
    """({query: last_green_round}, latest_round_seen) over every
    committed CORRECTNESS_r*.json. A sampled-but-red row does NOT
    refresh a query (it ranks as stale-or-worse, which is the point)."""
    hist: dict[str, int] = {}
    latest = 0
    for path in sorted(
        glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))
    ):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        latest = max(latest, rnd)
        for name, row in data.items():
            if _is_green(row):
                hist[name] = max(hist.get(name, -1), rnd)
    return hist, latest


def priority_order(
    registered: list[str],
    hist: dict[str, int],
    changed: tuple[str, ...] = (),
    head: int = 50,
) -> list[str]:
    """The computed sample head: never-green, then changed-this-round,
    then oldest-green-first. Deterministic (alphabetical within each
    tier) and total over the registry; the first `head` names are the
    driver sample."""
    reg = set(registered)
    never = sorted(n for n in reg if n not in hist)
    chg = sorted(n for n in changed if n in reg and n not in set(never))
    placed = set(never) | set(chg)
    rest = sorted(
        (n for n in reg if n not in placed),
        key=lambda n: (hist[n], n),
    )
    order = never + chg + rest
    return order[:head]


def staleness_histogram(
    registered: list[str], hist: dict[str, int]
) -> dict[str, int]:
    """{'never': n, 'r<N>': n, ...} — the coverage-debt summary STATUS
    prints (generated, so it cannot drift from the artifacts again)."""
    out: dict[str, int] = {}
    for n in registered:
        key = f"r{hist[n]}" if n in hist else "never"
        out[key] = out.get(key, 0) + 1
    return dict(
        sorted(out.items(), key=lambda kv: (kv[0] != "never", kv[0]))
    )


def projected_debt(
    registered: list[str],
    hist: dict[str, int],
    priority: list[str],
    next_round: int,
    rounds_ahead: int = 4,
    new_per_round: int = 10,
    head: int = 50,
) -> list[dict]:
    """Projection of the staleness ceiling over the next few rounds,
    assuming the computed rotation runs each round with ~new_per_round
    new never-sampled ops taking head slots (r15 verdict #7: make the
    'can the sample keep every cohort under the ceiling' question a
    generated table, not prose). Simulation: each round the oldest
    cohorts fill the head after the new ops; sampled queries become
    green at that round."""
    sim = dict(hist)
    for n in priority:
        sim[n] = next_round  # this round's sample goes green
    rows = []
    for rnd in range(next_round, next_round + rounds_ahead + 1):
        if rnd > next_round:
            # future round: new ops take slots, remainder drains oldest
            budget = head - new_per_round
            stale_first = sorted(
                (n for n in registered if n in sim),
                key=lambda n: (sim[n], n),
            )
            for n in stale_first[:budget]:
                sim[n] = rnd
        oldest = min(sim.get(n, rnd) for n in registered)
        over = sum(
            1
            for n in registered
            if rnd - sim.get(n, rnd) >= STALENESS_CEILING
        )
        rows.append(
            {
                "round": rnd,
                "oldest_green": oldest,
                "max_staleness": rnd - oldest,
                "n_at_or_over_ceiling": over,
            }
        )
    return rows
