"""Property-based round-trip for the pure-numpy NetCDF-3 classic codec:
ANY fixed-dim dataset the writer can express must survive write->parse
bit-exactly (names, dims, attrs, dtypes, values including NaN)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from icenetetl_spark.sources.netcdf3 import NC3Var, parse_netcdf3, write_netcdf3

_DTYPES = [np.int8, np.int16, np.int32, np.float32, np.float64]

_names = st.text(
    alphabet=st.characters(whitelist_categories=("Ll",), max_codepoint=122),
    min_size=1,
    max_size=8,
)


@st.composite
def _datasets(draw):
    n_dims = draw(st.integers(1, 3))
    dim_names = draw(
        st.lists(_names, min_size=n_dims, max_size=n_dims, unique=True)
    )
    dims = {name: draw(st.integers(1, 4)) for name in dim_names}
    n_vars = draw(st.integers(1, 4))
    var_names = draw(
        st.lists(_names, min_size=n_vars, max_size=n_vars, unique=True)
    )
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    variables = []
    for vn in var_names:
        vdims = tuple(
            d for d in dim_names if draw(st.booleans())
        )  # any subset incl. scalar ()
        shape = tuple(dims[d] for d in vdims)
        dt = draw(st.sampled_from(_DTYPES))
        if np.issubdtype(dt, np.floating):
            data = rng.standard_normal(shape).astype(dt)
            if data.size and draw(st.booleans()):
                flat = data.reshape(-1)
                flat[draw(st.integers(0, flat.size - 1))] = np.nan
        else:
            data = rng.integers(-100, 100, size=shape).astype(dt)
        attrs = {}
        if draw(st.booleans()):
            attrs["units"] = draw(_names)
        variables.append(NC3Var(vn, vdims, attrs, data))
    gattrs = {"title": draw(_names), "level": np.float64(draw(st.integers(0, 9)))}
    return dims, variables, gattrs


@settings(max_examples=30, deadline=None)
@given(_datasets())
def test_roundtrip_any_fixed_dim_dataset(ds):
    dims, variables, gattrs = ds
    nc = parse_netcdf3(write_netcdf3(dims, variables, gattrs))
    assert nc.dims == dims
    assert nc.attrs["title"] == gattrs["title"]
    assert float(nc.attrs["level"]) == float(gattrs["level"])
    assert nc.var_order == [v.name for v in variables]
    for v in variables:
        got = nc.variables[v.name]
        assert got.dims == v.dims
        assert got.data.dtype == v.data.dtype.newbyteorder("=")
        np.testing.assert_array_equal(got.data, v.data)
        for k, val in v.attrs.items():
            assert got.attrs[k] == val
