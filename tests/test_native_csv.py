"""Native columnar CSV parser: correctness vs pandas on the bundled sample."""

import numpy as np
import pandas as pd
import pytest

from scenario_wise_rec_tpu.data import native

SAMPLE = "/root/reference/scripts/data/ali-ccp/ali_ccp_train_sample.csv"

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_matches_pandas_on_sample():
    cols = native.read_csv_columnar(SAMPLE)
    df = pd.read_csv(SAMPLE)
    assert set(cols) == set(df.columns)
    for name in df.columns:
        ours = cols[name]
        theirs = df[name].to_numpy()
        assert len(ours) == len(theirs)
        np.testing.assert_allclose(ours.astype(np.float64),
                                   theirs.astype(np.float64), rtol=1e-12)


def test_types_and_roundtrip(tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b,c\n1,2.5,3\n-4,1e-3,0\n7,.5,9\n")
    cols = native.read_csv_columnar(str(p))
    assert cols["a"].dtype == np.int64
    assert cols["b"].dtype == np.float64
    assert cols["c"].dtype == np.int64
    np.testing.assert_array_equal(cols["a"], [1, -4, 7])
    np.testing.assert_allclose(cols["b"], [2.5, 1e-3, 0.5])


def test_missing_file_raises():
    with pytest.raises(RuntimeError):
        native.read_csv_columnar("/nonexistent/file.csv")
