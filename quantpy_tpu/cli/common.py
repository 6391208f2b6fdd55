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


def validate_record(doc: dict, kind: str) -> None:
    """Fail fast with actionable messages on malformed records (the numeric
    layers otherwise surface shape mismatches as einsum internals)."""
    import numpy as np

    povm = np.asarray(doc.get("povm_matrix", None), dtype=object)
    if povm.ndim == 0 or np.asarray(doc["povm_matrix"]).ndim != 3:
        raise ValueError(
            "`povm_matrix` must be a 3-D (n_povms, n_outcomes, 4^n) array "
            "of bloch rows"
        )
    povm = np.asarray(doc["povm_matrix"], dtype=float)
    outcomes = np.asarray(doc["outcomes"], dtype=float)
    expected_nd = 2 if kind == "state" else 3
    if outcomes.ndim != expected_nd or outcomes.shape[-2:] != povm.shape[:2]:
        raise ValueError(
            f"`outcomes` must have shape {'(S,) + ' if kind == 'process' else ''}"
            f"(n_povms, n_outcomes) = {povm.shape[:2]} to match `povm_matrix`; "
            f"got {outcomes.shape}"
        )
    if kind == "process":
        states = np.asarray(doc["input_states"], dtype=float)
        if states.ndim != 2 or states.shape[-1] != povm.shape[-1]:
            raise ValueError(
                "`input_states` must be (S, 4^n) bloch vectors matching the "
                f"POVM dimension {povm.shape[-1]}; got {states.shape}"
            )
        if outcomes.shape[0] != states.shape[0]:
            raise ValueError(
                f"`outcomes` has {outcomes.shape[0]} state blocks but "
                f"`input_states` lists {states.shape[0]} states"
            )


def emit(output: dict, path: str | None) -> None:
    if path:
        with open(path, "w") as fp:
            json.dump(output, fp, indent=4)
    else:
        from pprint import pprint

        pprint(output)
