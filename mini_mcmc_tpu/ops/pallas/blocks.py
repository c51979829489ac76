"""Grid-block sizing shared by the fused multi-step kernels."""

from __future__ import annotations


def fit_grid_block(c: int, block_c: int, *, what: str = "fused kernel") -> int:
    """Largest 1024-multiple divisor of ``c`` not exceeding ``block_c``.

    The fused kernels pack chains onto (8 sublanes x 128 lanes) tiles and
    split them into ``c // bc`` grid blocks, so ``bc`` must be a
    1024-multiple divisor of ``c``. ``min(block_c, c)`` alone rejects
    legal chain counts like 9216 (= 9 * 1024, not divisible by 8192);
    this picks the largest legal block instead, and raises only when no
    legal block exists (``c`` not a 1024-multiple).
    """
    if c % 1024:
        raise ValueError(
            f"the {what} needs n_chains to be a multiple of 1024 "
            f"(8 sublanes x 128 lanes); got n_chains={c}"
        )
    m = c // 1024
    for k in range(max(1, min(block_c, c) // 1024), 0, -1):
        if m % k == 0:
            return 1024 * k
    return 1024
