import numpy as np
import jax.numpy as jnp

from bwtb3m_tpu.ops.lf import lf_walk
from bwtb3m_tpu.ops.lf_pallas import fits_vmem, lf_walk_pallas
from bwtb3m_tpu.ops.rank import build_occ
from bwtb3m_tpu.ops.rank_packed import build_occ_packed
from oracle import random_string


def test_pallas_lf_interpret_matches_xla():
    bwt = random_string(4000, 4, seed=2)
    packed = build_occ_packed(bwt, 4)
    plain = build_occ(bwt, 4)
    assert fits_vmem(packed)
    r0 = jnp.asarray(np.arange(0, 4000, 11).astype(np.int32))
    ref, _ = lf_walk(plain, r0, 64)
    got = lf_walk_pallas(packed, r0, 64, True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
