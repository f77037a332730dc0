"""Enumerations shared across the LOO-CV estimators.

Mirrors the reference method namespaces (reference ``pyloo/constants.py:7-50``).
"""

from enum import Enum
from typing import Literal


class LooApproximationMethod(str, Enum):
    """Cheap elpd approximations used to drive subsampling.

    PLPD uses the log predictive density at a posterior point estimate,
    LPD the full log predictive density, TIS/SIS the cheaper importance
    sampling variants.
    """

    PLPD = "plpd"
    LPD = "lpd"
    TIS = "tis"
    SIS = "sis"


class EstimatorMethod(str, Enum):
    """Population-elpd estimators for subsampled LOO.

    DIFF_SRS: difference estimator under simple random sampling (default).
    HH_PPS: Hansen-Hurwitz estimator, probability proportional to size.
    SRS: plain simple random sampling estimator.
    """

    DIFF_SRS = "diff_srs"
    HH_PPS = "hh_pps"
    SRS = "srs"


LooApproximationMethodType = Literal["plpd", "lpd", "tis", "sis"]
EstimatorMethodType = Literal["diff_srs", "hh_pps", "srs"]
SCALE_OPTIONS = Literal["deviance", "log", "negative_log"]
