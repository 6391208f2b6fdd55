"""Shared CLI plumbing for the interval entry points.

JSON document schema (matching the reference's scripts/*.py and its worked
example input.json:1-26):
  povm_matrix   : (m, p, 4^n) bloch rows
  outcomes      : measured counts, (m, p) for states, (S, m, p) for processes
  input_states  : (S, 4^n) bloch vectors (process only)
  conf_levels   : list of confidence levels (optional)
  target_state / target_process : bloch vector of the target (optional)
"""

from __future__ import annotations

import json
from argparse import ArgumentParser


def build_parser(description: str) -> ArgumentParser:
    parser = ArgumentParser(description=description)
    parser.add_argument(
        "-i", "--input", type=str, required=True, help="path to input data file"
    )
    parser.add_argument(
        "-o", "--output", type=str, default=None, help="path to output file"
    )
    parser.add_argument(
        "--no-ci", default=False, action="store_true",
        help="skip confidence intervals",
    )
    return parser


def load_input(path: str) -> dict:
    with open(path) as fp:
        return json.load(fp)


def emit(output: dict, path: str | None) -> None:
    if path:
        with open(path, "w") as fp:
            json.dump(output, fp, indent=4)
    else:
        from pprint import pprint

        pprint(output)
