"""Student-t critical values.

The reference ships `data/t_test.txt` (122 rows x 9 cols: df, then two-sided
critical values at alpha = 0.5, 0.4, 0.2, 0.1, 0.05, 0.025, 0.01 and a
one-sided 0.001 column) and indexes column 5 (alpha=0.05) and column 8
(alpha=0.001) in the t-test association (`src/Object.cc:514-527`). We
generate the same table numerically at import."""

from __future__ import annotations

import numpy as np

N_DF = 122
COL_ALPHA_05 = 5
COL_ALPHA_001 = 8


def _build() -> np.ndarray:
    from scipy.stats import t as t_dist
    qs = [0.75, 0.80, 0.90, 0.95, 0.975, 0.9875, 0.995, 0.999]
    tab = np.zeros((N_DF, 9), np.float32)
    for df in range(1, N_DF):
        tab[df, 0] = df
        for j, q in enumerate(qs):
            tab[df, j + 1] = t_dist.ppf(q, df)
    tab[0] = tab[1]
    return tab


T_TABLE = _build()


def crit(df, col: int = COL_ALPHA_05) -> np.ndarray:
    """Vectorized lookup, clamped like the reference's min(df-1, 121)."""
    import jax.numpy as jnp
    tab = jnp.asarray(T_TABLE[:, col])
    return tab[jnp.clip(df, 1, N_DF - 1)]
