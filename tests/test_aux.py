"""Auxiliary subsystems: adaptive GenEO selection, checkpoint/resume,
printers, verbosity logging.

Reference parity: computeGenSymShiftInvertMinMagnitudeAdaptive
(arpack_geneo_wrapper.hh:661-774) for the adaptive solver; the show()
printers (multivector.hh:148-233); the verbose-level scheme
(arpack_geneo_wrapper.hh:407-414). Checkpoint/resume is a new capability
(the reference has none, SURVEY.md §5).
"""

import numpy as np

from dune_eigensolver_tpu.sparse import problems


def _pair(N=24):
    A = problems.laplacian_neumann_2d(N, dtype=np.float64)
    B = problems.laplacian_b_2d(N, 3, dtype=np.float64)
    return A, B


def test_adaptive_grows_until_threshold():
    from dune_eigensolver_tpu.solvers import generalized_inverse_adaptive

    A, B = _pair()
    # eigenvalues of this pair start near 0 and grow; pick a threshold that
    # requires more than the initial block of 8
    res, n_below = generalized_inverse_adaptive(
        A, B, threshold=0.5, nev=8, tol=1e-4, maxiter=400, shift=1e-3, min_iter=3
    )
    ev = np.asarray(res.eigenvalues)
    assert ev.max() >= 0.5  # coverage reached
    assert n_below == int((ev < 0.5).sum())
    assert len(ev) > 8  # actually grew


def test_adaptive_stops_immediately_when_covered():
    from dune_eigensolver_tpu.solvers import generalized_inverse_adaptive

    A, B = _pair()
    res, n_below = generalized_inverse_adaptive(
        A, B, threshold=1e-9, nev=8, tol=1e-4, maxiter=400, shift=1e-3, min_iter=3
    )
    assert len(np.asarray(res.eigenvalues)) == 8
    assert n_below <= 1  # only the near-null eigenvalue sits below 1e-9


def test_checkpoint_resume(tmp_path):
    from dune_eigensolver_tpu.solvers import generalized_inverse
    from dune_eigensolver_tpu.solvers.checkpoint import (
        generalized_inverse_checkpointed,
        load_checkpoint,
    )

    A, B = _pair()
    path = str(tmp_path / "state.npz")
    kw = dict(nev=4, tol=1e-8, maxiter=300, shift=1e-3, min_iter=3)

    # run only a few iterations (simulated interruption via tiny maxiter)
    partial = generalized_inverse_checkpointed(
        A, B, checkpoint_path=path, checkpoint_every=5,
        **{**kw, "maxiter": 5},
    )
    state = load_checkpoint(path)
    assert state is not None and state[1] >= 5

    # resume to convergence; must agree with the uninterrupted run
    full = generalized_inverse_checkpointed(
        A, B, checkpoint_path=path, checkpoint_every=50, **kw
    )
    ref = generalized_inverse(A, B, **kw)
    np.testing.assert_allclose(
        np.asarray(full.eigenvalues), np.asarray(ref.eigenvalues), atol=1e-8
    )
    assert bool(full.converged)


def test_lobpcg_checkpoint_resume(tmp_path):
    from dune_eigensolver_tpu.solvers import (
        lobpcg_generalized,
        lobpcg_generalized_checkpointed,
    )
    from dune_eigensolver_tpu.solvers.checkpoint import load_checkpoint

    A, B = _pair()
    path = str(tmp_path / "state.npz")
    kw = dict(nev=4, tol=1e-8, maxiter=300, shift=1e-3, min_iter=3)

    # interrupted run: two 3-iteration segments
    lobpcg_generalized_checkpointed(
        A, B, checkpoint_path=path, checkpoint_every=3,
        **{**kw, "maxiter": 6},
    )
    state = load_checkpoint(path)
    assert state is not None and state[1] >= 6

    # resume to convergence; warm-started X loses only the P direction,
    # so the eigenvalues must still match the uninterrupted run
    full = lobpcg_generalized_checkpointed(
        A, B, checkpoint_path=path, checkpoint_every=100, **kw
    )
    ref = lobpcg_generalized(A, B, **kw)
    np.testing.assert_allclose(
        np.asarray(full.eigenvalues), np.asarray(ref.eigenvalues), atol=1e-6
    )
    assert bool(full.converged)


def test_printers(capsys):
    from dune_eigensolver_tpu.utils.printers import show, show_spectrum

    show(np.arange(12.0).reshape(6, 2), name="mv", max_rows=4)
    out = capsys.readouterr().out
    assert "mv: shape=(6, 2)" in out and "more rows" in out

    A = problems.laplacian_dirichlet_2d(3, dtype=np.float64)
    show(A, max_rows=4)
    out = capsys.readouterr().out
    assert "DIAMatrix" in out

    show_spectrum([1.0, 2.0], reference=np.array([1.0, 2.5]))
    out = capsys.readouterr().out
    assert "max error: 5.000e-01" in out


def test_vlog(capsys):
    from dune_eigensolver_tpu.utils.vlog import VLog

    log = VLog(verbose=1)
    log(1, "visible")
    log(2, "hidden")
    with log.span("phase", level=1):
        pass
    out = capsys.readouterr().out
    assert "visible" in out and "hidden" not in out and "phase:" in out
