"""The TPE sampler behind hparams_search sampler=tpe (train/tpe.py) — the
working analogue of the reference's Optuna TPESampler template
(reference: configs/hparams_search/mnist_optuna.yaml)."""

from __future__ import annotations

import math

import numpy as np

from anomalyclip_tpu.train import tpe

SPACE = {
    "lr": {"type": "loguniform", "low": 1e-6, "high": 1e-1},
    "k": {"type": "choice", "values": [2, 3, 4]},
    "depth": {"type": "int", "low": 1, "high": 4},
    "drop": {"type": "uniform", "low": 0.0, "high": 1.0},
}


def test_suggestions_respect_types_and_bounds():
    rng = np.random.default_rng(0)
    history = []
    for i in range(30):
        p = tpe.suggest(SPACE, history, rng, maximize=False)
        assert 1e-6 <= p["lr"] <= 1e-1
        assert p["k"] in (2, 3, 4)
        assert isinstance(p["depth"], int) and 1 <= p["depth"] <= 4
        assert 0.0 <= p["drop"] <= 1.0
        history.append((p, float(i)))


def test_startup_phase_uses_random_draws():
    calls = []

    def fake_random(spec):
        calls.append(spec)
        return spec["values"][0] if spec.get("type") == "choice" else spec["low"]

    rng = np.random.default_rng(0)
    p = tpe.suggest(SPACE, [], rng, n_startup=4, sample_random=fake_random)
    assert len(calls) == len(SPACE)
    assert p["k"] == 2 and p["lr"] == 1e-6


def test_tpe_concentrates_near_the_optimum():
    """After warmup, suggestions should cluster around the good region — and a
    TPE run must beat pure random sampling on the same budget (seeded)."""
    space = {
        "lr": {"type": "loguniform", "low": 1e-6, "high": 1e-1},
        "k": {"type": "choice", "values": [2, 3, 4]},
    }

    def objective(p):  # optimum at lr=1e-4, k=3
        return (math.log10(p["lr"]) + 4.0) ** 2 + (0.0 if p["k"] == 3 else 1.0)

    hist = tpe.minimize_demo(objective, space, n_trials=40, seed=1)
    best_tpe = min(v for _, v in hist)

    rng = np.random.default_rng(1)
    best_rand = min(
        objective(
            {
                "lr": math.exp(rng.uniform(math.log(1e-6), math.log(1e-1))),
                "k": int(rng.choice([2, 3, 4])),
            }
        )
        for _ in range(40)
    )
    assert best_tpe < 0.25, best_tpe  # found the basin
    assert best_tpe <= best_rand + 1e-9, (best_tpe, best_rand)
    # late-phase suggestions concentrate: median log-lr of the last 10 trials
    # sits inside +-1.5 decades of the optimum
    late = [math.log10(p["lr"]) for p, _ in hist[-10:]]
    assert abs(float(np.median(late)) + 4.0) < 1.5, late


def test_parzen_mixture_handles_empty_and_singleton_sets():
    x = np.linspace(0.0, 1.0, 5)
    spec = {"type": "uniform", "low": 0.0, "high": 1.0}
    flat = tpe._parzen_logpdf(x, np.asarray([]), spec)
    assert np.allclose(flat, flat[0])  # uniform prior
    single = tpe._parzen_logpdf(x, np.asarray([0.5]), spec)
    assert single[2] == max(single)  # peaked at the observation
