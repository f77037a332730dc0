"""Load the reference pyloo's pure-NumPy kernels for direct parity testing.

The reference package (`/root/reference/pyloo`) imports ``xarray`` and
``arviz`` at module top level, neither of which exists in this environment.
Its numerical kernels (``_psislw``, ``_gpdfit``, ``_gpinv``, ``_sislw``,
``_tislw``, the survey estimators) are pure NumPy, so we stub just enough of
xarray/arviz in ``sys.modules`` to import the modules, grab the kernels, and
remove the stubs again.

The modules are loaded under a private package name (``_refpyloo``) so the
reference's ``pyloo/__init__.py`` — which pulls in the full dependency tree —
never executes.
"""

from __future__ import annotations

import importlib.util
import sys
import types

_REF_ROOT = "/root/reference/pyloo"
_PKG = "_refpyloo"

_cache: dict[str, types.ModuleType] = {}


def _make_stubs() -> dict[str, types.ModuleType]:
    xr = types.ModuleType("xarray")

    class _DataArray:  # only used in isinstance() checks at runtime
        pass

    def _apply_ufunc(*args, **kwargs):  # never called by the kernels we test
        raise NotImplementedError("xarray stub")

    xr.DataArray = _DataArray
    xr.apply_ufunc = _apply_ufunc

    az = types.ModuleType("arviz")

    class _InferenceData:
        pass

    az.InferenceData = _InferenceData
    return {"xarray": xr, "arviz": az}


def load_reference_module(relpath: str) -> types.ModuleType:
    """Import e.g. ``"psis"`` or ``"estimators/difference"`` from the reference.

    Returns the loaded module; results are cached per path.
    """
    if relpath in _cache:
        return _cache[relpath]

    stubs = _make_stubs()
    saved = {name: sys.modules.get(name) for name in stubs}
    sys.modules.update(stubs)
    try:
        # synthesize the bare packages so relative imports resolve without
        # executing the reference's __init__.py files
        if _PKG not in sys.modules:
            pkg = types.ModuleType(_PKG)
            pkg.__path__ = [_REF_ROOT]
            sys.modules[_PKG] = pkg
        if "/" in relpath:
            sub = relpath.split("/")[0]
            subpkg_name = f"{_PKG}.{sub}"
            if subpkg_name not in sys.modules:
                subpkg = types.ModuleType(subpkg_name)
                subpkg.__path__ = [f"{_REF_ROOT}/{sub}"]
                sys.modules[subpkg_name] = subpkg

        modname = f"{_PKG}.{relpath.replace('/', '.')}"
        deps = {
            "psis": ["utils"],
            "sis": ["utils"],
            "tis": ["utils"],
            "estimators/difference": ["estimators/base"],
            "estimators/hansen_hurwitz": ["estimators/base"],
            "estimators/srs": ["estimators/base"],
        }
        for dep in deps.get(relpath, []):
            load_reference_module(dep)

        spec = importlib.util.spec_from_file_location(
            modname, f"{_REF_ROOT}/{relpath}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[modname] = mod
        spec.loader.exec_module(mod)
        _cache[relpath] = mod
        return mod
    finally:
        for name, orig in saved.items():
            if orig is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = orig
