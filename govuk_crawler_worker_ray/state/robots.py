"""robots.txt support (north-rule addition; ABSENT in the reference —
SURVEY.md §4 rate-limiting row).  Off by default
(``CrawlConfig.respect_robots=False``) so reference-parity goldens are
unchanged; when on, disallowed frontier rows are dropped at the read
gate exactly like blacklisted ones (acked-drop).

Parser implements the de-facto standard: UA groups, Allow/Disallow
prefix rules, longest-match wins, Allow wins ties; specific UA group
overrides ``*``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

USER_AGENT = "GOV.UK Crawler Worker"  # crawler.go:74-75


@dataclass
class RobotsRules:
    # (is_allow, prefix) rules for the applicable UA group
    rules: list[tuple[bool, str]] = field(default_factory=list)

    def allowed(self, path: str) -> bool:
        best_len = -1
        best_allow = True
        for is_allow, prefix in self.rules:
            if prefix == "":
                continue  # empty Disallow = allow everything
            if path.startswith(prefix) and len(prefix) > best_len:
                best_len = len(prefix)
                best_allow = is_allow
            elif path.startswith(prefix) and len(prefix) == best_len:
                best_allow = best_allow or is_allow  # Allow wins ties
        return best_allow


def parse_robots(body: str, user_agent: str = USER_AGENT) -> RobotsRules:
    """Parse robots.txt: pick the most specific matching UA group."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_group_body = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_body:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_group_body = False
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_group_body = True
            cur_rules.append((key == "allow", val))
    if cur_agents or cur_rules:
        groups.append((cur_agents, cur_rules))

    ua = user_agent.lower()
    best: list[tuple[bool, str]] | None = None
    best_spec = -1
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                spec = 0
            elif a in ua or ua.startswith(a):
                spec = len(a)
            else:
                continue
            if spec > best_spec:
                best_spec = spec
                best = rules
    return RobotsRules(rules=best or [])


def robots_url(host: str) -> str:
    return f"https://{host}/robots.txt"
