"""robots.txt: parse + cached per-host rule evaluation.

The reference crawler has no robots support; the north rule
(BASELINE.json:6) adds "robots.txt caching" alongside the reference's
politeness throttling. Semantics implemented (the de-facto standard used
by major crawlers): rules from the matching user-agent group (exact agent
token else ``*``), longest-path-prefix match wins, Allow beats Disallow
on equal length, no rule ⇒ allowed. ``$`` end-anchor and ``*`` wildcards
inside paths are supported.

At scale the cache is a broadcast dimension table: one row per host
(robots bodies are small and hosts ≪ URLs), parsed once on the driver,
evaluated inside the fused scrape UDF batch — no extra fetches and no
per-row Python stage.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from urllib.parse import urlsplit

__all__ = ["RobotsRules", "parse_robots", "RobotsCache"]


@dataclass(frozen=True)
class RobotsRules:
    # (allow: bool, path_pattern: str) in file order
    rules: tuple
    # Crawl-delay of the matched agent group (seconds), None when absent
    crawl_delay: float | None = None

    def allowed(self, path: str) -> bool:
        if not path:
            path = "/"
        best_len = -1
        best_allow = True
        for allow, pattern in self.rules:
            m_len = _match_len(pattern, path)
            if m_len is None:
                continue
            if m_len > best_len or (m_len == best_len and allow and not best_allow):
                best_len = m_len
                best_allow = allow
        return best_allow


def _match_len(pattern: str, path: str) -> int | None:
    """Longest-match length if the robots pattern matches, else None."""
    if not pattern:
        return None
    if "*" in pattern or pattern.endswith("$"):
        rx = re.escape(pattern).replace(r"\*", ".*")
        if rx.endswith(r"\$"):
            rx = rx[:-2] + "$"
        return len(pattern) if re.match(rx, path) else None
    return len(pattern) if path.startswith(pattern) else None


def parse_robots(body: str, agent: str = "wcm-spark") -> RobotsRules:
    agent = agent.lower()
    groups: dict[str, list] = {}
    delays: dict[str, float] = {}
    current_agents: list[str] = []
    seen_rule_since_agent = True
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if seen_rule_since_agent:
                current_agents = []
                seen_rule_since_agent = False
            current_agents.append(value.lower())
            for a in current_agents:
                groups.setdefault(a, [])
        elif field in ("allow", "disallow"):
            seen_rule_since_agent = True
            if not current_agents:
                continue
            if field == "disallow" and value == "":
                continue  # empty Disallow = allow all (no rule)
            for a in current_agents:
                groups.setdefault(a, []).append((field == "allow", value))
        elif field == "crawl-delay":
            # non-standard but honored by major crawlers; the matched
            # group's delay feeds per-host wall-clock politeness (F6)
            seen_rule_since_agent = True
            try:
                d = float(value)
            except ValueError:
                continue
            if d >= 0:
                for a in current_agents:
                    groups.setdefault(a, [])
                    delays[a] = d
    best_name: str | None = None
    for name in groups:
        if name != "*" and name in agent:
            if best_name is None or len(name) > len(best_name):
                best_name = name
    if best_name is None and "*" in groups:
        best_name = "*"
    if best_name is None:
        return RobotsRules(())
    return RobotsRules(tuple(groups[best_name]), delays.get(best_name))


class RobotsCache:
    """Per-host parsed-rule cache; broadcast-friendly (plain dict state)."""

    def __init__(self, bodies: dict[str, str] | None = None, agent: str = "wcm-spark"):
        self.agent = agent
        self._rules: dict[str, RobotsRules] = {}
        for host_key, body in (bodies or {}).items():
            self._rules[host_key] = parse_robots(body, agent)

    def allowed(self, host_key: str | None, url: str) -> bool:
        if host_key is None:
            return True
        rules = self._rules.get(host_key)
        if rules is None:
            return True  # no robots.txt ⇒ allowed
        try:
            parts = urlsplit(url)
            path = parts.path or "/"
            if parts.query:
                path += "?" + parts.query
        except ValueError:
            return True
        return rules.allowed(path)

    def delay(self, host_key: str | None) -> float:
        """Matched-group Crawl-delay for the host (seconds; 0.0 = none)."""
        if host_key is None:
            return 0.0
        rules = self._rules.get(host_key)
        return rules.crawl_delay or 0.0 if rules is not None else 0.0

    def host_delays(self) -> dict[str, float]:
        """{host_key: crawl_delay} for hosts that declare one — the
        broadcast-friendly politeness dimension the fetcher consumes."""
        return {
            k: v.crawl_delay
            for k, v in self._rules.items()
            if v.crawl_delay
        }

    def to_bodies_state(self) -> dict:
        return {
            "agent": self.agent,
            "rules": {k: v.rules for k, v in self._rules.items()},
            "delays": {
                k: v.crawl_delay
                for k, v in self._rules.items()
                if v.crawl_delay is not None
            },
        }

    @classmethod
    def from_state(cls, state: dict) -> "RobotsCache":
        out = cls(agent=state["agent"])
        delays = state.get("delays", {})  # absent in pre-delay checkpoints
        out._rules = {
            k: RobotsRules(tuple(map(tuple, v)), delays.get(k))
            for k, v in state["rules"].items()
        }
        return out
