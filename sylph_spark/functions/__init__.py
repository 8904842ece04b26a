from .exprs import (  # noqa: F401
    adj_sim_expr,
    fracminhash_keep,
    hamming64_expr,
    naive_sim_expr,
    ratio_lambda_agg_exprs,
)
