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
        assert not self.config_d or len(self.config_d) == len(config)
        assert not self.result_d or len(self.result_d) == len(result)
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
