"""Result reporter — capability parity with utils/reporter.py:17-60:
accumulate (config, result) dict pairs, export one CSV."""

from __future__ import annotations

from typing import Dict


class Reporter:
    def __init__(self):
        self.config_d: Dict[str, list] = {}
        self.result_d: Dict[str, list] = {}
        self.cnt = 0

    def add(self, config: dict, result: dict) -> None:
        assert isinstance(config, dict) and isinstance(result, dict)
        # key EQUALITY, not just length: same-size dicts with different keys
        # would build ragged columns that crash export() after the whole
        # sweep has run
        assert not self.config_d or set(self.config_d) == set(config), (
            sorted(self.config_d), sorted(config))
        assert not self.result_d or set(self.result_d) == set(result), (
            sorted(self.result_d), sorted(result))
        for k, v in config.items():
            self.config_d.setdefault(k, []).append(v)
        for k, v in result.items():
            self.result_d.setdefault(k, []).append(v)
        self.cnt += 1

    def export(self, fn: str, delimiter: str = ",") -> None:
        head = delimiter.join(list(self.config_d) + list(self.result_d))
        rows = []
        for i in range(self.cnt):
            row = [self.config_d[k][i] for k in self.config_d]
            row += [self.result_d[k][i] for k in self.result_d]
            rows.append(delimiter.join(map(str, row)))
        with open(fn, "w") as f:
            f.write("\n".join([head] + rows))
