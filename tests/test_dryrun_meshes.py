"""Every supported mesh factorization passes the dryrun numeric cross-check
(VERDICT r4 next #7).

dryrun_multichip is the driver's multi-chip artifact; it embeds a
sharded-vs-single-device cross-check (same loss, same updated params — GSPMD
collectives are layout, not math). Previously only its default factorization
(dp4 x tp2 at n=8) ever ran; here pure-dp and the deeper tp split get the
same certification under the suite's 8-virtual-device CPU mesh.
"""

import pytest


@pytest.mark.slow
@pytest.mark.parametrize(
    "dp,tp",
    [(8, 1), (4, 2), (2, 4)],
    ids=["dp8", "dp4xtp2", "dp2xtp4"],
)
def test_dryrun_mesh_factorization(dp, tp):
    import __graft_entry__ as ge

    # asserts internally: finite loss, tp sharding non-replicated when tp>1,
    # and the 1-device numeric cross-check (loss rel 2e-4, params atol 1e-4)
    ge.dryrun_multichip(dp * tp, data_parallel=dp, model_parallel=tp)
