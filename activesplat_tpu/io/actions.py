"""actions.txt writer/reader (the trajectory output replayed by the coverage
judge; format: one Habitat-style action name per line, written by the
reference's dataloader as it steps, src/dataloader/dataloader.py:255-263)."""

from __future__ import annotations

import os
from typing import List

ACTIONS = ("stop", "move_forward", "turn_left", "turn_right", "look_up", "look_down")


class ActionLog:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._fh = open(path, "w")

    def append(self, action: str) -> None:
        assert action in ACTIONS, f"unknown action {action!r}"
        self._fh.write(action + "\n")
        self._fh.flush()

    def close(self) -> None:
        self._fh.close()


def read_actions(path: str) -> List[str]:
    with open(path) as fh:
        return [line.strip() for line in fh if line.strip()]
