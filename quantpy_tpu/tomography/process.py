"""ProcessTomograph — quantum process tomography with the reference's API.

API parity with reference quantpy/tomography/process.py:23-327: construction
from a channel + input-state set (must span the operator space), per-input
StateTomograph children, `experiment`, `results` get/set, and
`point_estimate('lifp'|'pgdb'|'states')` with optional CPTP projection, plus
the projection routines `cptp_projection` / `tp_projection` / `cp_projection`.

All heavy numerics live in process_core (Choi-bloch representation, jitted);
this class is the thin host orchestration layer.
"""

from __future__ import annotations

import numpy as np

from ..basis import Basis
from ..routines import generate_single_entries
from ..channel import Channel
from ..measurements import generate_measurement_matrix
from ..ops.geometry import resolve_distance
from ..qobj import Qobj
from . import process_core, state_core
from .state import StateTomograph

__all__ = ["ProcessTomograph"]


def _generate_input_states(input_states, n_qubits: int):
    """Input states from a preset name or an explicit list
    (reference process.py:330-339)."""
    if isinstance(input_states, (list, tuple)):
        return [s if isinstance(s, Qobj) else Qobj(s) for s in input_states]
    blochs = np.squeeze(generate_measurement_matrix(input_states, n_qubits))
    states = []
    for b in np.atleast_2d(blochs):
        q = Qobj(b)
        states.append(q / complex(q.trace()).real)
    return states




class ProcessTomograph:
    """Simulate process-tomography experiments and reconstruct channels.

    Parameters
    ----------
    channel : Channel
    input_states : str or list, default='proj4'
        Must form a basis of the operator space (4^n elements).
    dst : str or callable, default='hs'
    key : jax PRNG key or int seed, optional
    """

    #: from this qubit count on, lifp's CPTP projection runs host-chunked
    #: (cptp_project_bloch_host) instead of as one fused while_loop
    BIG_N_QUBITS = 5

    def __init__(self, channel, input_states="proj4", dst="hs", key=None):
        import jax

        self.channel = channel
        self.dst = resolve_distance(dst)
        self.input_states = input_states
        # single-qubit factor of a preset input-state basis (the full basis
        # is its tensor power): enables the fully-factored 6+ qubit
        # analytic interval paths (kron_analytic.channel_l2_moments_kron)
        self._states1_t = (
            np.stack(
                [s.T.bloch for s in _generate_input_states(input_states, 1)]
            )
            if isinstance(input_states, str)
            else None
        )
        self.input_basis = Basis(_generate_input_states(input_states, channel.n_qubits))
        if self.input_basis.dim != 4**channel.n_qubits:
            raise ValueError("Input states do not constitute a basis")
        dim = 2**channel.n_qubits
        # decomposition of every single-entry matrix in the input basis
        # (reference process.py:82-87), used by the 'states' method and
        # the Holder interval
        self._decomposed_single_entries = self.input_basis.decompose_batch(
            np.stack([np.asarray(e) for e in generate_single_entries(dim)])
        )
        if key is None:
            key = 0
        self._key = jax.random.key(key) if isinstance(key, int) else key
        self.tomographs: list[StateTomograph] | None = None

    def _next_key(self):
        import jax

        self._key, sub = jax.random.split(self._key)
        return sub

    # -- experiment -------------------------------------------------------------

    def experiment(self, n_measurements, povm="proj-set", warm_start: bool = False):
        """State tomography of every transformed input state, batched into
        one device call (reference process.py:91-129 loops tomographs)."""
        import jax.numpy as jnp

        from ..config import rdtype

        n = self.channel.n_qubits
        povm_matrix = generate_measurement_matrix(povm, n)
        # single-qubit POVM factor (for the factored 6+ qubit intervals)
        if isinstance(povm, str):
            from ..measurements import _single_qubit_preset

            self._povm1 = _single_qubit_preset(povm)
        elif isinstance(povm, np.ndarray) and povm.shape[-1] == 4 and n > 1:
            self._povm1 = povm if povm.ndim == 3 else povm[None]
        else:
            self._povm1 = None
        n_povms = povm_matrix.shape[0]
        if np.issubdtype(type(n_measurements), np.integer):
            n_measurements = np.full(n_povms, n_measurements, dtype=np.float64)
        else:
            n_measurements = np.asarray(n_measurements, dtype=np.float64)

        if not warm_start or self.tomographs is None:
            self.tomographs = [
                StateTomograph(self.channel.transform(s), key=None)
                for s in self.input_basis.elements
            ]
        out_blochs = np.stack([t.state.bloch for t in self.tomographs])
        # chunk the sampling over input states: at 5 qubits one fused call
        # draws 1024 x 243 multinomials and exceeds the axon runtime's
        # ~60 s single-execution cap (docs/tpu_constraints.md)
        cells_per_state = povm_matrix.shape[0] * povm_matrix.shape[1]
        chunk = max(1, (1 << 21) // cells_per_state)
        povm_dev = jnp.asarray(povm_matrix, dtype=rdtype())
        n_meas_dev = jnp.asarray(n_measurements, dtype=rdtype())
        counts = np.concatenate(
            [
                np.asarray(
                    process_core.simulate_process_experiment(
                        self._next_key(),
                        povm_dev,
                        jnp.asarray(out_blochs[lo : lo + chunk], dtype=rdtype()),
                        n_meas_dev,
                    ),
                    dtype=np.float64,
                )
                for lo in range(0, out_blochs.shape[0], chunk)
            ]
        )
        for tmg, c in zip(self.tomographs, counts):
            if warm_start and tmg.results is not None:
                self._povm1 = None  # merged designs are no tensor power
                prev_total = float(np.sum(tmg.n_measurements))
                new_total = float(np.sum(n_measurements))
                tmg.povm_matrix = np.vstack(
                    [tmg.povm_matrix * prev_total, povm_matrix * new_total]
                ) / (prev_total + new_total)
                tmg.n_measurements = np.concatenate(
                    [tmg.n_measurements, n_measurements]
                )
                tmg._results = np.vstack([tmg._results, c])
            else:
                tmg.povm_matrix = np.asarray(povm_matrix, dtype=np.float64)
                tmg.n_measurements = n_measurements
                tmg._results = c

    # -- results access (reference process.py:131-140) ----------------------------

    @property
    def results(self):
        assert self.tomographs is not None, "No results"
        return np.stack([t.results for t in self.tomographs])

    @results.setter
    def results(self, results):
        assert self.tomographs is not None, "Call experiment first"
        for tmg, r in zip(self.tomographs, results):
            tmg.results = r

    # -- estimation ----------------------------------------------------------------

    def _input_blochs_t(self) -> np.ndarray:
        """(S, 4^n) bloch vectors of transposed input states."""
        return np.stack([s.T.bloch for s in self.input_basis.elements])

    def _measurement_operator(self):
        import jax.numpy as jnp

        from ..config import rdtype

        t0 = self.tomographs[0]
        return process_core.measurement_operator(
            jnp.asarray(self._input_blochs_t(), dtype=rdtype()),
            jnp.asarray(t0.povm_matrix, dtype=rdtype()),
            jnp.asarray(t0.n_measurements, dtype=rdtype()),
        )

    def point_estimate(
        self,
        method: str = "lifp",
        cptp: bool = True,
        n_iter: int | None = None,
        tol: float = 1e-10,
        states_est_method: str = "lin",
        states_physical: bool = True,
        states_init: str = "lin",
    ) -> Channel:
        """Reconstruct the Choi matrix (reference process.py:142-229).

        'lifp': bloch-space linear inversion (+ optional CPTP projection)
        'pgdb': projected gradient descent on the NLL (with a *corrected*
                convergence criterion; the reference's is inverted,
                process.py:303 — documented divergence)
        'dys':  Davis-Yin three-operator splitting on the same CPTP MLE —
                one CP prox per iteration instead of a nested Dykstra per
                gradient step; no reference counterpart (measured 26x over
                pgdb at 4 qubits, docs/benchmarks.md)
        'states': per-output-state reconstruction recombined through the
                input basis

        `n_iter=None` (the default) resolves to the per-method budget
        (pgdb/states: 1000, dys: 10000 with an NLL-plateau stop); an
        explicit integer is honored as given for every method (the
        reference's shared n_iter=1000 default, process.py:142-177).
        """
        if self.tomographs is None or self.tomographs[0].results is None:
            raise RuntimeError("Run `experiment` or set `results` first")
        if n_iter is not None:
            n_iter = max(int(n_iter), 1)
        if method == "lifp":
            import jax.numpy as jnp

            from ..config import rdtype

            t0 = self.tomographs[0]
            big = self.channel.n_qubits >= self.BIG_N_QUBITS  # 1024-dim
            # eigh per Dykstra iteration: the fused projection exceeds the
            # ~60 s per-execution cap there (docs/tpu_constraints.md)
            choi_bloch = process_core.estimate_lifp_factored(
                self.results,
                jnp.asarray(self._input_blochs_t(), dtype=rdtype()),
                jnp.asarray(t0.povm_matrix, dtype=rdtype()),
                jnp.asarray(t0.n_measurements, dtype=rdtype()),
                cptp=cptp and not big,
                cptp_tol=self._cptp_tol(tol),
            )
            if cptp and big:
                # cp='ns': the matmul-only Newton-Schulz engine — measured
                # at 5q/2000 iters: 61.5 s vs 370.8 s for eigh at identical
                # hs-to-truth and TP residual (docs/benchmarks.md)
                choi_bloch = process_core.cptp_project_bloch_host(
                    choi_bloch, tol=self._cptp_tol(tol), cp="ns"
                )
            self.reconstructed_channel = Channel(
                Qobj(np.asarray(choi_bloch, dtype=np.float64))
            )
        elif method == "dys":
            import jax.numpy as jnp

            from ..config import rdtype

            t0 = self.tomographs[0]
            big = self.channel.n_qubits >= self.BIG_N_QUBITS
            # lifp warm start (same rationale as the 4+ qubit pgdb path);
            # at 5+ qubits the fused Dykstra would exceed the ~60 s
            # per-execution cap, so project host-chunked instead
            init = process_core.estimate_lifp_factored(
                self.results,
                jnp.asarray(self._input_blochs_t(), dtype=rdtype()),
                jnp.asarray(t0.povm_matrix, dtype=rdtype()),
                jnp.asarray(t0.n_measurements, dtype=rdtype()),
                cptp=not big,
                cptp_tol=self._cptp_tol(tol),
            )
            if big:
                # a warm START only needs rough feasibility — 200 Dykstra
                # iterations, not the full projection (dys itself enforces
                # CPTP at its optimum; measured at 5q: same final
                # hs-to-truth, ~5 min less wall time)
                init = process_core.cptp_project_bloch_host(
                    init, max_iter=200, tol=self._cptp_tol(tol), cp="ns"
                )
            choi_bloch = process_core.estimate_dys_factored(
                self.results,
                jnp.asarray(self._input_blochs_t(), dtype=rdtype()),
                jnp.asarray(t0.povm_matrix, dtype=rdtype()),
                jnp.asarray(t0.n_measurements, dtype=rdtype()),
                max_iter=10000 if n_iter is None else n_iter,
                init_bloch=init,
            )
            self.reconstructed_channel = Channel(
                Qobj(np.asarray(choi_bloch, dtype=np.float64))
            )
        elif method == "pgdb":
            import jax.numpy as jnp

            from ..config import rdtype

            t0 = self.tomographs[0]
            if self.channel.n_qubits >= 4:
                # 4+ qubits: host-driven outer loop (one jitted step per
                # device call) — the axon TPU runtime kills single
                # executions after ~60 s and the fused descent loop
                # exceeds that there (docs/tpu_constraints.md) — and a
                # lifp warm start (documented divergence from the
                # reference's fully-depolarized start, process.py:292):
                # measured ~10 steps to the f32 NLL floor vs >40 without
                init = process_core.estimate_lifp_factored(
                    self.results,
                    jnp.asarray(self._input_blochs_t(), dtype=rdtype()),
                    jnp.asarray(t0.povm_matrix, dtype=rdtype()),
                    jnp.asarray(t0.n_measurements, dtype=rdtype()),
                    cptp=True,
                    cptp_tol=self._cptp_tol(tol),
                )
                choi_bloch = process_core.estimate_pgdb_factored_host(
                    self.results,
                    jnp.asarray(self._input_blochs_t(), dtype=rdtype()),
                    jnp.asarray(t0.povm_matrix, dtype=rdtype()),
                    jnp.asarray(t0.n_measurements, dtype=rdtype()),
                    max_iter=1000 if n_iter is None else n_iter,
                    tol=tol,
                    init_bloch=init,
                )
            else:
                choi_bloch = process_core.estimate_pgdb_factored(
                    self.results,
                    jnp.asarray(self._input_blochs_t(), dtype=rdtype()),
                    jnp.asarray(t0.povm_matrix, dtype=rdtype()),
                    jnp.asarray(t0.n_measurements, dtype=rdtype()),
                    max_iter=1000 if n_iter is None else n_iter,
                    tol=tol,
                )
            self.reconstructed_channel = Channel(
                Qobj(np.asarray(choi_bloch, dtype=np.float64))
            )
        elif method == "states":
            self.reconstructed_channel = self._estimate_states(
                cptp, states_est_method, states_physical, states_init, n_iter, tol
            )
        else:
            raise ValueError("Incorrect value for argument `method`")
        return self.reconstructed_channel

    def _estimate_states(self, cptp, method, physical, init, n_iter, tol) -> Channel:
        """'states' method (reference process.py:316-327): reconstruct each
        output state (one batched device call), then recombine single-entry
        decompositions through the output basis."""
        t0 = self.tomographs[0]
        counts = self.results  # (S, m, p)
        blochs = np.asarray(
            state_core.estimate(
                counts,
                t0.povm_matrix,
                t0.n_measurements,
                method=method,
                physical=physical,
                init=init,
                max_iter=100 if method == "lin" else (1000 if n_iter is None else n_iter),
                tol=tol if method != "lin" else 1e-3,
            ),
            dtype=np.float64,
        )
        output_states = [Qobj(b) for b in blochs]
        for tmg, q in zip(self.tomographs, output_states):
            tmg.reconstructed_state = q
        output_basis = Basis(output_states)
        dim = 2**self.channel.n_qubits
        choi = np.zeros((dim * dim, dim * dim), dtype=np.complex128)
        for dec in self._decomposed_single_entries:
            e_in = self.input_basis.compose(dec)
            e_out = output_basis.compose(dec)
            choi += np.kron(e_in.matrix, e_out.matrix)
        channel = Channel(Qobj(choi))
        if cptp and not channel.is_cptp(verbose=False):
            channel = self.cptp_projection(channel, tol=self._cptp_tol(1e-12))
        return channel

    # -- projections (reference process.py:231-278) -------------------------------

    @staticmethod
    def _cptp_tol(tol: float) -> float:
        """Dykstra tolerance floored at working precision (f32 on TPU).

        The stop criterion is the SQUARED correction increment, so the
        floor scales as eps^1.5 (measured at 3 qubits on TPU: a 100*eps
        floor left a 1.8e-2 trace-preservation error; eps^1.5 ~ 4e-11
        converges to TP error ~1e-4 in a few hundred extra iterations)."""
        from ..config import rdtype

        eps = float(np.finfo(np.dtype(rdtype())).eps)
        return max(eps**1.5, tol)

    def cptp_projection(self, channel: Channel, n_iter: int = 1000, tol=1e-12):
        """Project a channel onto CPTP space (Dykstra; reference
        process.py:231-235)."""
        bloch = channel.choi.bloch
        out = process_core.cptp_project_bloch(
            np.asarray(bloch, dtype=np.float64), n_iter, self._cptp_tol(tol)
        )
        return Channel(Qobj(np.asarray(out, dtype=np.float64)))

    def _cptp_projection_vec(
        self, choi_bloch, n_iter: int = 1000, tol=1e-12, cp: str = "eigh"
    ):
        """Bloch-vector CPTP projection (used by MHMC update rule;
        reference process.py:237-257 works on complex vecs instead).
        `cp` selects the CP engine ('eigh'/'ns', see cptp_project_bloch)."""
        return process_core.cptp_project_bloch(
            choi_bloch, n_iter, self._cptp_tol(tol), cp
        )

    def tp_projection(self, channel: Channel, vectorized: bool = False):
        """Projection onto trace-preserving maps (reference
        process.py:259-268)."""
        out = np.asarray(
            process_core.tp_project_bloch(np.asarray(channel.choi.bloch)),
            dtype=np.float64,
        )
        return out if vectorized else Channel(Qobj(out))

    def cp_projection(self, channel: Channel, vectorized: bool = False):
        """Projection onto completely positive maps (reference
        process.py:270-278)."""
        out = np.asarray(
            process_core.cp_project_bloch(np.asarray(channel.choi.bloch)),
            dtype=np.float64,
        )
        return out if vectorized else Channel(Qobj(out))

    def _cptp_update_rule(self, x_t, delta, step):
        """MHMC proposal: CPTP-project x + step * delta (choi bloch vectors;
        reference process.py:280-282).

        At 4+ qubits the per-proposal projection runs on the Newton-Schulz
        engine: 100 eigh(256+)-Dykstra iterations PER CHAIN STEP made the
        4-qubit sampler unusable (round-2 verdict); the matmul-only prox
        runs the same 100 iterations in milliseconds, which is what makes
        MHMCProcessInterval practical at 4 qubits (docs/benchmarks.md)."""
        cp = "ns" if self.channel.n_qubits >= 4 else "eigh"
        return self._cptp_projection_vec(x_t + step * delta, n_iter=100, cp=cp)

    def _nll(self, choi_bloch):
        """Process NLL of a Choi bloch vector under the current data
        (reference process.py:310-314); used by MHMC intervals.

        Uses the factored matvec — the dense (S*K, 16^n) operator the
        reference rebuilds per evaluation (process.py:197-211) is never
        formed, so MHMC process sampling scales past 2 qubits."""
        import jax.numpy as jnp

        from ..config import rdtype

        t0 = self.tomographs[0]
        w = state_core.weighted_povm_flat(t0.povm_matrix, t0.n_measurements)
        flat = np.concatenate([t.flat_results for t in self.tomographs])
        return process_core.process_nll_factored(
            jnp.asarray(choi_bloch, dtype=rdtype()),
            jnp.asarray(self._input_blochs_t(), dtype=rdtype()),
            w,
            jnp.asarray(flat, rdtype()),
        )
