"""robots.txt parsing from RAW content — the missing half of the F14
robots gate (the engine's gate consumes structured (disallow,
crawl_delay) rows; real crawls fetch ``/robots.txt`` bytes first).

Reference: ``protocol/RobotRulesParser.java`` delegates to
crawler-commons ``SimpleRobotRulesParser``; the semantics implemented
here are the public RFC 9309 / crawler-commons essentials:

- ``field: value`` lines, ``#`` comments stripped, field names
  case-insensitive;
- a GROUP is one or more consecutive ``User-agent`` lines followed by
  rules; a rule line before any group is ignored;
- agent matching is case-insensitive substring on the product token
  (crawler-commons matches the robot name anywhere in the UA value);
  groups for OUR agent beat ``*`` groups — when any specific group
  matched, every ``*`` group is ignored;
- ``Disallow:`` with an empty value allows everything; ``Allow``
  wins over ``Disallow`` on equal-length prefix; otherwise the
  LONGEST matching prefix decides (RFC 9309 §2.2.2);
- ``Crawl-delay`` seconds (fractional ok) -> milliseconds.

The per-row parse is a pandas UDF (string munging over a small file,
once per host per refresh — nowhere near the hot path); the decision
function ``allowed`` is pure and shared with tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

ROBOTS_RULES_SCHEMA_FIELDS = [
    T.StructField("disallow", T.ArrayType(T.StringType())),
    T.StructField("allow", T.ArrayType(T.StringType())),
    T.StructField("crawl_delay_ms", T.LongType()),
]


def parse_robots_text(text: str, agent: str) -> dict:
    """-> {"disallow": [...], "allow": [...], "crawl_delay_ms": int|None}
    for ``agent`` (lowercase product token)."""
    agent = agent.lower()
    groups: list[dict] = []  # {"agents": [...], "disallow": [], "allow": [], "delay": None}
    current: dict | None = None
    collecting_agents = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not collecting_agents:
                current = {"agents": [], "disallow": [], "allow": [], "delay": None}
                groups.append(current)
                collecting_agents = True
            current["agents"].append(value.lower())
            continue
        collecting_agents = False
        if current is None:
            continue  # rule line before any group
        if field == "disallow":
            if value:
                current["disallow"].append(value)
        elif field == "allow":
            if value:
                current["allow"].append(value)
        elif field == "crawl-delay":
            try:
                current["delay"] = int(float(value) * 1000)
            except ValueError:
                pass

    def matches(g: dict) -> bool:
        return any(agent in a for a in g["agents"] if a != "*")

    chosen = [g for g in groups if matches(g)]
    if not chosen:
        chosen = [g for g in groups if "*" in g["agents"]]
    disallow: list[str] = []
    allow: list[str] = []
    delay = None
    for g in chosen:
        disallow.extend(g["disallow"])
        allow.extend(g["allow"])
        if g["delay"] is not None and delay is None:
            delay = g["delay"]
    return {"disallow": disallow, "allow": allow, "crawl_delay_ms": delay}


def allowed(path: str, rules: dict) -> bool:
    """RFC 9309 §2.2.2 longest-match decision; Allow wins ties."""
    best_allow = max(
        (len(p) for p in rules.get("allow", ()) if path.startswith(p)), default=-1
    )
    best_disallow = max(
        (len(p) for p in rules.get("disallow", ()) if path.startswith(p)), default=-1
    )
    return best_allow >= best_disallow


def parse_robots_col(
    df: DataFrame, text_col: str = "robots_txt", agent: str = "wns", id_col: str = "host"
) -> DataFrame:
    """(id, disallow, allow, crawl_delay_ms) per raw robots.txt row —
    drop-in producer for the structured robots table the fetch gate
    consumes (robots_denied_col / queue_spacing_cols)."""
    import pandas as pd

    out_schema = T.StructType(
        [T.StructField(id_col, T.StringType())] + ROBOTS_RULES_SCHEMA_FIELDS
    )

    def _batches(it):
        for pdf in it:
            rows = []
            for rid, txt in zip(pdf[id_col], pdf[text_col]):
                r = parse_robots_text(txt, agent)
                rows.append(
                    {
                        id_col: rid,
                        "disallow": r["disallow"],
                        "allow": r["allow"],
                        "crawl_delay_ms": r["crawl_delay_ms"],
                    }
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "disallow", "allow", "crawl_delay_ms"]
            )

    return df.select(id_col, text_col).mapInPandas(_batches, out_schema)
