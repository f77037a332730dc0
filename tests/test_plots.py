"""Smoke tests for the diagnostic plots (Agg backend)."""

import warnings

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pytest

import pyloo_tpu as pl


@pytest.fixture(scope="module")
def results():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        c = pl.load_example_data("centered_eight")
        nc = pl.load_example_data("non_centered_eight")
        return pl.loo(c, pointwise=True), pl.loo(nc, pointwise=True), c


@pytest.fixture(autouse=True)
def close_figures():
    yield
    plt.close("all")


def test_plot_loo_k_and_elpd(results):
    r1, _, _ = results
    ax = pl.plot_loo(r1, threshold=0.7)
    assert ax.get_ylabel() == "Pareto k"
    assert len(ax.collections) >= 1
    ax2 = pl.plot_loo(r1, show_elpd=True)
    assert ax2.get_ylabel() == "ELPD"


def test_plot_loo_requires_pointwise(results):
    _, _, c = results
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        non_pw = pl.loo(c)
    with pytest.raises(ValueError, match="pointwise"):
        pl.plot_loo(non_pw)


def test_plot_influence(results):
    r1, _, _ = results
    ax = pl.plot_influence(r1, n_points=5)
    assert len(ax.patches) >= 5  # bars (>=5 if high-k forced in)
    ax2 = pl.plot_influence(r1, n_points=-3, sort=True)
    assert len(ax2.patches) >= 3


def test_plot_loo_difference(results):
    r1, r2, c = results
    y = c.observed_data.y.values
    ax = pl.plot_loo_difference(
        y, r1, r2, group=(y > 5).astype(int), outlier_thresh=0.3, jitter=0.1
    )
    assert ax.get_ylabel() == "ELPD difference"
    with pytest.raises(ValueError, match="must match"):
        pl.plot_loo_difference(y[:3], r1, r2)


def test_backend_validation(results):
    r1, _, _ = results
    with pytest.raises(KeyError, match="not implemented"):
        pl.plot_loo(r1, backend="bokeh")


def test_existing_axis_reused(results):
    r1, _, _ = results
    fig, my_ax = plt.subplots()
    out = pl.plot_loo(r1, ax=my_ax)
    assert out is my_ax


@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"var_name": None},
        {"color": "blue"},
        {"threshold": 0.7},
        {"sort": False},
        {"n_points": 5},
        {"use_pareto_k": False},
        {"figsize": (8, 6)},
        {"textsize": 12},
    ],
)
def test_plot_influence_kwargs(results, kwargs):
    r, _, _ = results
    ax = pl.plot_influence(r, **kwargs)
    assert ax is not None


@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"var_name": None},
        {"color": "blue"},
        {"threshold": 0.7},
        {"show_pareto_k": False},
        {"show_elpd": True},
        {"figsize": (8, 6)},
        {"textsize": 12},
    ],
)
def test_plot_loo_kwargs(results, kwargs):
    r, _, _ = results
    ax = pl.plot_loo(r, **kwargs)
    assert ax is not None


@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"group": None},
        {"outlier_thresh": 2.0},
        {"size": 2},
        {"alpha": 0.7},
        {"jitter": 0.1},
        {"jitter": (0.1, 0.2)},
        {
            "sort_by_group": True,
            "group": np.array(["Group A", "Group B"] * 4),
        },
        {"figsize": (8, 6)},
        {"textsize": 12},
    ],
)
def test_plot_loo_difference_kwargs(results, kwargs):
    r1, r2, _ = results
    x = np.arange(len(r1.loo_i.values))
    ax = pl.plot_loo_difference(x, r1, r2, **kwargs)
    assert ax is not None


def test_plot_loo_difference_validation(results):
    r1, r2, _ = results
    with pytest.raises(ValueError, match="[Ll]ength"):
        pl.plot_loo_difference(np.arange(7), r1, r2)
    with pytest.raises(ValueError, match="[Ll]ength"):
        pl.plot_loo_difference(
            np.arange(8), r1, r2, group=["A"] * 7
        )


def test_show_parameter_does_not_block(results, monkeypatch):
    r, r2, _ = results
    shown = []
    monkeypatch.setattr(plt, "show", lambda: shown.append(True))
    pl.plot_loo(r, show=True)
    pl.plot_influence(r, show=True)
    pl.plot_loo_difference(
        np.arange(8), r, r2, show=True
    )
    assert len(shown) == 3


def test_backend_kwargs_passthrough(results):
    r, _, _ = results
    ax = pl.plot_loo(r, backend_kwargs={"figsize": (4, 3)})
    fig = ax.get_figure()
    assert tuple(fig.get_size_inches()) == (4.0, 3.0)


def test_explicit_backend_matplotlib(results):
    r, _, _ = results
    ax = pl.plot_loo(r, backend="matplotlib")
    assert ax is not None


def test_plots_accept_streamed_results():
    """Streamed ELPDData (1-D obs DataArrays) drives the plot family."""
    import warnings

    import jax.numpy as jnp

    import pyloo_tpu as pl

    rng = np.random.default_rng(21)
    B, S = 40, 120
    ll = rng.normal(-1.0, 0.5, size=(B, S))
    llj = jnp.asarray(ll)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = pl.loo_streaming(
            lambda i: llj[i], B, S, pointwise=True, chunk_size=16,
            dtype=jnp.float64,
        )
    ax = pl.plot_loo(res, show=False)
    assert ax is not None
    ax2 = pl.plot_influence(res, show=False)
    assert ax2 is not None


class TestPlotLooPit:
    """LOO-PIT calibration plot (pyloo_tpu extension)."""

    def _pit(self, n=60, seed=0):
        rng = np.random.default_rng(seed)
        return rng.uniform(size=n)

    def test_ecdf_with_precomputed_pit(self):
        ax = pl.plot_loo_pit(self._pit())
        assert ax.get_ylabel() == "Empirical CDF"
        labels = [t.get_text() for t in ax.get_legend().get_texts()]
        assert "LOO-PIT ECDF" in labels and "95% DKW band" in labels

    def test_hist_kind(self):
        ax = pl.plot_loo_pit(self._pit(), kind="hist", n_bins=7)
        assert ax.get_ylabel() == "Density"
        assert len(ax.patches) == 7

    def test_computes_pit_from_data(self):
        rng = np.random.default_rng(1)
        n, s = 20, 150
        y = rng.normal(size=n)
        y_hat = rng.normal(size=(n, s))
        ll = rng.normal(-1, 0.1, size=(n, s))
        d = pl.from_dict(log_likelihood={"obs": ll.T.reshape(1, s, n)})
        ax = pl.plot_loo_pit(data=d, y=y, y_hat=y_hat, reff=1.0)
        assert ax.get_title() == "LOO-PIT calibration"

    def test_validation(self):
        with pytest.raises(ValueError, match="pit.*or.*data"):
            pl.plot_loo_pit()
        with pytest.raises(ValueError, match="kind"):
            pl.plot_loo_pit(self._pit(), kind="kde")

    def test_dataarray_pit_accepted(self):
        rng = np.random.default_rng(2)
        n, s = 10, 100
        y = rng.normal(size=n)
        y_hat = rng.normal(size=(n, s))
        ll = rng.normal(-1, 0.1, size=(n, s))
        d = pl.from_dict(log_likelihood={"obs": ll.T.reshape(1, s, n)})
        pit = pl.loo_pit(d, y=y, y_hat=y_hat, reff=1.0)
        ax = pl.plot_loo_pit(pit)
        assert ax is not None


class TestPlotCompare:
    """Model-comparison forest plot over compare() output."""

    @pytest.fixture(scope="class")
    def comp(self, results):
        r1, r2, _ = results
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            return pl.loo_compare({"centered": r1, "non_centered": r2})

    def test_basic(self, comp):
        ax = pl.plot_compare(comp)
        labels = [t.get_text() for t in ax.get_yticklabels()]
        # best-ranked model renders as the TOP row
        assert labels == list(comp.sort_values("rank").index)
        assert ax.get_xlabel().startswith("elpd loo")
        # point estimates + diff triangles + best-model vline in the legend
        legend = [t.get_text() for t in ax.get_legend().get_texts()]
        assert any("elpd loo" in t for t in legend)
        assert any("difference" in t for t in legend)

    def test_diff_triangle_positions(self, comp):
        """Triangles must sit at each non-best model's own point estimate.

        Regression test: elpd_diff is signed (model - best on log scale),
        so reconstructing ``best - diff`` mirrors the triangle to the wrong
        side of the best-model line.  The backend plots elpd[mask] directly.
        """
        ax = pl.plot_compare(comp)
        df = comp.sort_values("rank")
        ic = next(c for c in df.columns if c.startswith("elpd_") and c != "elpd_diff")
        elpd = np.asarray(df[ic], dtype=float)
        best_idx = int(np.asarray(df["rank"], dtype=int).argmin())
        expected_x = np.delete(elpd, best_idx)
        # second errorbar container carries the diff triangles
        tri = ax.containers[1]
        got_x = np.asarray(tri[0].get_xdata(), dtype=float)
        np.testing.assert_allclose(np.sort(got_x), np.sort(expected_x), rtol=1e-12)

    def test_no_diff_rows(self, comp):
        ax = pl.plot_compare(comp, plot_ic_diff=False, legend=False)
        assert ax.get_legend() is None
        # exactly one errorbar group (no triangles)
        assert len(ax.containers) == 1

    def test_existing_axis_and_alias(self, comp):
        fig, my_ax = plt.subplots()
        out = pl.compare_plot(comp, ax=my_ax)
        assert out is my_ax

    def test_waic_column_detected(self, results):
        r1c, _, c = results
        nc = pl.load_example_data("non_centered_eight")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            comp = pl.loo_compare(
                {"centered": c, "non_centered": nc}, ic="waic"
            )
        ax = pl.plot_compare(comp)
        assert ax.get_xlabel().startswith("elpd waic")

    def test_rejects_non_compare_frame(self):
        import pandas as pd

        with pytest.raises(ValueError, match="elpd_<ic>"):
            pl.plot_compare(pd.DataFrame({"a": [1.0]}))

    def test_show_does_not_block(self, comp, monkeypatch):
        shown = []
        monkeypatch.setattr(plt, "show", lambda: shown.append(True))
        pl.plot_compare(comp, show=True)
        assert shown == [True]


def test_arviz_style_aliases():
    """az-style drop-in names: pl.compare(...) callable, pl.plot_khat."""
    import importlib

    assert callable(pl.compare)
    assert pl.plot_khat is pl.plot_loo
    # pl.compare is the (callable) submodule: calling it forwards to
    # loo_compare, and every module access path keeps working
    m = importlib.import_module("pyloo_tpu.compare")
    assert m is pl.compare
    assert hasattr(m, "loo_compare")
    from pyloo_tpu.compare import loo_compare as lc

    assert lc is pl.loo_compare
    # plain `import pyloo_tpu.compare as c` binds the module, not a function
    import pyloo_tpu.compare as c

    assert c is m
    assert c.loo_compare is pl.loo_compare


def test_callable_compare_module_forwards():
    """pl.compare({...}) behaves exactly like pl.loo_compare({...})."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        c = pl.load_example_data("centered_eight")
        nc = pl.load_example_data("non_centered_eight")
        r = {"c": pl.loo(c, pointwise=True), "nc": pl.loo(nc, pointwise=True)}
        via_module = pl.compare(r)
        via_func = pl.loo_compare(r)
    assert list(via_module.index) == list(via_func.index)
    np.testing.assert_allclose(
        np.asarray(via_module["elpd_loo"], dtype=float),
        np.asarray(via_func["elpd_loo"], dtype=float),
    )
