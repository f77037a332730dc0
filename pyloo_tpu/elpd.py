"""ELPD result container with the diagnostic report formats.

The user-visible report strings reproduce the reference output exactly
(reference ``pyloo/elpd.py:10-97`` templates, ``:115-424`` rendering) since
they are part of the observable API; the rendering logic here is organized as
per-kind formatters dispatched from ``__str__``.
"""

from __future__ import annotations

from copy import copy as _copy
from copy import deepcopy as _deepcopy

import numpy as np
import pandas as pd

__all__ = ["ELPDData"]

STD_BASE_FMT = """
Computed from {n_samples} posterior samples and {n_points} observations log-likelihood matrix.

         Estimate       SE
elpd_loo   {elpd:<8.2f}    {se:<.2f}
p_loo       {p_loo:<8.2f}    {p_loo_se:<.2f}
looic      {looic:<8.2f}    {looic_se:<.2f}"""

MVN_BASE_FMT = """
Computed from {n_samples} posterior samples and {n_points} observations log-likelihood matrix.
Using non-factorized multivariate normal model.

         Estimate       SE
elpd_loo   {elpd:<8.2f}    {se:<.2f}
p_loo       {p_loo:<8.2f}    {p_loo_se:<.2f}
looic      {looic:<8.2f}    {looic_se:<.2f}"""

MVT_BASE_FMT = """
Computed from {n_samples} posterior samples and {n_points} observations log-likelihood matrix.
Using non-factorized multivariate Student-t model.

         Estimate       SE
elpd_loo   {elpd:<8.2f}    {se:<.2f}
p_loo       {p_loo:<8.2f}    {p_loo_se:<.2f}
looic      {looic:<8.2f}    {looic_se:<.2f}"""

SUBSAMPLE_BASE_FMT = """
Computed from {n_samples} by {subsample_size} subsampled log-likelihood
values from {n_data_points} total observations.

         Estimate       SE  subsampling SE
elpd_loo   {elpd_loo:<8.2f}    {elpd_loo_se:<.2f}         {elpd_loo_subsamp_se:<.2f}
p_loo       {p_loo:<8.2f}    {p_loo_se:<.2f}         {p_loo_subsamp_se:<.2f}
looic      {looic:<8.2f}    {looic_se:<.2f}         {looic_subsamp_se:<.2f}
{pareto_msg}"""

APPROX_POSTERIOR_FMT = """
Computed from {n_samples} posterior samples and {n_points} observations log-likelihood matrix.
Posterior approximation correction used.
------

         Estimate       SE
elpd_loo   {elpd:<8.2f}    {se:<.2f}
p_loo       {p_loo:<8.2f}    {p_loo_se:<.2f}
looic      {looic:<8.2f}    {looic_se:<.2f}"""

KFOLD_BASE_FMT = """
Computed from {n_samples} posterior samples using {K}-fold cross-validation
with {n_points} observations.{stratify_msg}

           Estimate       SE
elpd_kfold   {elpd:<8.2f}    {se:<.2f}
p_kfold       {p_kfold:<8.2f}    {p_kfold_se:<.2f}
kfoldic      {kfoldic:<8.2f}    {kfoldic_se:<.2f}
"""

# Generic held-out-data ELPD (R loo::elpd parity; no reference analogue).
GENERIC_ELPD_FMT = """
Computed from {n_samples} by {n_points} log-likelihood matrix using the generic elpd function.

     Estimate       SE
elpd   {elpd:<8.2f}    {se:<.2f}
ic     {ic:<8.2f}    {ic_se:<.2f}"""

# LFO-CV is a pyloo_tpu extension (no reference analogue); template follows
# the house style of the other result kinds.
LFO_BASE_FMT = """
Computed from {n_samples} posterior samples: {n_targets} {M}-step-ahead predictions with history >= {L} observations ({n_refits} exact refits).

         Estimate       SE
elpd_lfo   {elpd:<8.2f}    {se:<.2f}
lfoic      {lfoic:<8.2f}    {lfoic_se:<.2f}"""

LOGO_BASE_FMT = """
Computed from {n_samples} posterior samples and {n_groups} groups log-likelihood matrix.

         Estimate       SE
elpd_logo   {elpd:<8.2f}    {se:<.2f}
p_logo       {p_logo:<8.2f}    {p_logo_se:<.2f}
logoic      {logoic:<8.2f}    {logoic_se:<.2f}"""

# (The reference's __str__ raises KeyError on WAIC results — it reads the
# elpd_loo row unconditionally, elpd.py:347.  This template fixes that.)
WAIC_BASE_FMT = """
Computed from {n_samples} posterior samples and {n_points} observations log-likelihood matrix.

          Estimate       SE
elpd_waic   {elpd:<8.2f}    {se:<.2f}
p_waic       {p_waic:<8.2f}    -
waic       {waicic:<8.2f}    {waicic_se:<.2f}"""

MIXTURE_BASE_FMT = """
Computed from {n_samples} posterior samples and {n_points} observations log-likelihood matrix with
mixture posterior.

         Estimate       SE
elpd_loo   {elpd:<8.2f}    -"""

POINTWISE_LOO_FMT = """
------

Pareto k diagnostic values:
                         Count   Pct.
(-Inf, {2:.2f}]   (good)      {3:d}   {6:.1f}%
   ({2:.2f}, 1]   (bad)         {4:d}    {7:.1f}%
   (1, Inf)   (very bad)    {5:d}    {8:.1f}%"""

SCALE_DICT = {
    "log": "Using log score",
    "negative_log": "Using negative log score",
    "deviance": "Using deviance score",
}

_WARNING_NOTE = (
    "\n\nThere has been a warning during the calculation. Please check the"
    " results."
)


def _khat_counts(pareto_k, good_k):
    """Histogram k values into (good, bad, very bad] bins."""
    values = np.asarray(
        pareto_k.values if hasattr(pareto_k, "values") else pareto_k
    ).ravel()
    edges = np.array([-np.inf, good_k, 1.0, np.inf])
    counts, _ = np.histogram(values, bins=edges)
    return counts


def _khat_table(pareto_k, good_k):
    counts = _khat_counts(pareto_k, good_k)
    pct = counts / counts.sum() * 100
    return POINTWISE_LOO_FMT.format(
        "Count", "Pct.", good_k, counts[0], counts[1], counts[2],
        pct[0], pct[1], pct[2],
    )


def _all_good_msg(good_k):
    return (
        f"\n\nAll Pareto k estimates are good (k < {good_k:.1f})."
        "\nSee help('pareto-k-diagnostic') for details."
    )


def _pareto_section(data, *, default_msg=""):
    """Common k-diagnostic tail: histogram table, or the all-good message."""
    good_k = getattr(data, "good_k", None)
    if "pareto_k" in data and good_k is not None:
        counts = _khat_counts(data.pareto_k, good_k)
        if counts[1] == 0 and counts[2] == 0:
            return _all_good_msg(good_k), True
        return _khat_table(data.pareto_k, good_k), False
    return default_msg, None


class ELPDData(pd.Series):
    """Expected log pointwise predictive density results.

    A :class:`pandas.Series` whose index carries the estimates
    (``elpd_loo``/``se``/``p_loo``/...) and whose attributes carry auxiliary
    metadata (method, subsampling estimates, fold count, ...).
    """

    def __str__(self):
        parts = self.index[0].split("_")
        if len(parts) == 1 and parts[0] == "elpd":  # generic held-out elpd
            return GENERIC_ELPD_FMT.format(
                n_samples=self.n_samples,
                n_points=self.n_data_points,
                elpd=self["elpd"],
                se=self["se"],
                ic=self["ic"],
                ic_se=self["ic_se"],
            )
        kind = parts[1] if len(parts) > 1 else parts[0]
        if kind not in ("loo", "waic", "kfold", "logo", "lfo"):
            raise ValueError("Invalid ELPDData object")

        if kind == "kfold":
            return self._format_kfold()
        if kind == "logo":
            return self._format_logo()
        if kind == "lfo":
            return self._format_lfo()
        if "subsampling_SE" in self:
            return self._format_subsample()
        if kind == "waic":
            return self._format_waic()
        return self._format_standard(kind)

    def __repr__(self):
        return self.__str__()

    # -- formatters -------------------------------------------------------
    def _format_kfold(self):
        elpd = self["elpd_kfold"]
        se = self["se"]
        stratify_msg = (
            " Using stratified k-fold cross-validation" if self.stratified else ""
        )
        base = KFOLD_BASE_FMT.format(
            n_samples=self.n_samples,
            K=getattr(self, "K", None),
            n_points=self.n_data_points,
            elpd=elpd,
            se=se,
            p_kfold=self["p_kfold"],
            p_kfold_se=self["p_kfold_se"],
            kfoldic=-2 * elpd,
            kfoldic_se=2 * se,
            stratify_msg=stratify_msg,
        )
        if self.warning:
            base += _WARNING_NOTE
        return base

    def _format_logo(self):
        base = LOGO_BASE_FMT.format(
            n_samples=self.n_samples,
            n_groups=self.n_groups,
            elpd=self["elpd_logo"],
            se=self["se"],
            p_logo=self["p_logo"],
            p_logo_se=self.get("p_logo_se", float("nan")),
            logoic=self["logoic"],
            logoic_se=self["logoic_se"],
        )
        if self.warning:
            base += _WARNING_NOTE
        section, _ = _pareto_section(self)
        base += section
        return base

    def _format_lfo(self):
        base = LFO_BASE_FMT.format(
            n_samples=self.n_samples,
            n_targets=self.n_data_points,
            M=self.get("M", 1),
            L=self.get("L", "?"),
            n_refits=self.get("n_refits", 0),
            elpd=self["elpd_lfo"],
            se=self["se"],
            lfoic=self["lfoic"],
            lfoic_se=self["lfoic_se"],
        )
        if self.warning:
            base += _WARNING_NOTE
        section, _ = _pareto_section(self)
        base += section
        return base

    def _format_subsample(self):
        pareto_msg = (
            "\n\nAll Pareto k estimates are good (k < 0.7).\nSee"
            " help('pareto-k-diagnostic') for details."
        )
        section, all_good = _pareto_section(self)
        if all_good is False:
            pareto_msg = section
        elif all_good is True:
            pass  # reference keeps the default 0.7 message in this case

        elpd_loo = self["elpd_loo"]
        elpd_loo_se = self["se"]
        elpd_loo_subsamp_se = self["subsampling_SE"]
        base = SUBSAMPLE_BASE_FMT.format(
            elpd_loo=elpd_loo,
            elpd_loo_se=elpd_loo_se,
            elpd_loo_subsamp_se=elpd_loo_subsamp_se,
            p_loo=self["p_loo"],
            p_loo_se=self.get("p_loo_se", float("nan")),
            p_loo_subsamp_se=self.get("p_loo_subsampling_se", float("nan")),
            looic=-2 * elpd_loo,
            looic_se=2 * elpd_loo_se,
            looic_subsamp_se=2 * elpd_loo_subsamp_se,
            n_samples=self.n_samples,
            subsample_size=self["subsample_size"],
            n_data_points=self.n_data_points,
            pareto_msg=pareto_msg,
        )
        if self.warning:
            base += _WARNING_NOTE
        return base

    def _format_waic(self):
        elpd = self["elpd_waic"]
        se = self["se"]
        base = WAIC_BASE_FMT.format(
            n_samples=self.n_samples,
            n_points=self.n_data_points,
            elpd=elpd,
            se=se,
            p_waic=self["p_waic"],
            waicic=-2 * elpd,
            waicic_se=2 * se,
        )
        if self.warning:
            base += _WARNING_NOTE
        return base

    def _format_standard(self, kind):
        method = getattr(self, "method", "psis")
        pareto_msg, all_good = _pareto_section(self)
        if all_good is None and kind == "loo" and method == "psis":
            if self.warning:
                pareto_msg = (
                    "\n\nSome Pareto k diagnostic values are high (k > 0.70),"
                    " indicating that the importance sampling approximation is"
                    " unreliable. Consider using moment matching or exact LOO"
                    " for more accurate estimates. Use pointwise=True to see"
                    " detailed diagnostics."
                )
            else:
                pareto_msg = (
                    "\n\nAll Pareto k estimates are good (k <"
                    " 0.7).\nSee help('pareto-k-diagnostic') for details."
                )

        elpd_loo = self["elpd_loo"]
        se = self["se"]

        if hasattr(self, "approximate_posterior"):
            base = APPROX_POSTERIOR_FMT.format(
                n_samples=self.n_samples,
                n_points=self.n_data_points,
                elpd=elpd_loo,
                se=se,
                p_loo=self["p_loo"],
                p_loo_se=self["p_loo_se"],
                looic=self["looic"],
                looic_se=self["looic_se"],
            )
        elif "p_loo" not in self:
            base = MIXTURE_BASE_FMT.format(
                n_samples=self.n_samples,
                n_points=self.n_data_points,
                elpd=elpd_loo,
            )
        else:
            attrs = getattr(self, "attrs", {}) or {}
            if attrs.get("is_mvn", False):
                fmt = (
                    MVT_BASE_FMT
                    if attrs.get("model_type") == "student_t"
                    else MVN_BASE_FMT
                )
            else:
                fmt = STD_BASE_FMT
            base = fmt.format(
                n_samples=self.n_samples,
                n_points=self.n_data_points,
                elpd=elpd_loo,
                se=se,
                p_loo=self["p_loo"],
                p_loo_se=self["p_loo_se"],
                looic=self["looic"],
                looic_se=self["looic_se"],
            )

        if self.warning:
            base += _WARNING_NOTE
        base += pareto_msg
        return base

    # -- container behavior -------------------------------------------------
    @property
    def _constructor(self):
        # pandas operations on the Series keep the ELPDData type
        return ELPDData

    def copy(self, deep=True):
        copied = pd.Series.copy(self)
        for key in copied.keys():
            copied[key] = _deepcopy(copied[key]) if deep else _copy(copied[key])
        return ELPDData(copied)

    @property
    def n_samples(self):
        return self["n_samples"]

    @property
    def n_data_points(self):
        return self["n_data_points"]

    @property
    def n_groups(self):
        return self.get("n_groups", None)

    @property
    def warning(self):
        return self["warning"]

    @property
    def method(self):
        return getattr(self, "_method", "psis")

    @method.setter
    def method(self, value):
        self._method = value

    @property
    def estimates(self):
        return self._estimates

    @estimates.setter
    def estimates(self, value):
        self._estimates = value

    @property
    def K(self):
        return getattr(self, "_K", None)

    @K.setter
    def K(self, value):
        self._K = value

    @property
    def stratified(self):
        return getattr(self, "_stratified", False)

    @stratified.setter
    def stratified(self, value):
        self._stratified = value
