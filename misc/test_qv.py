#!/usr/bin/env python3
"""Independent cross-check of the adjusted-QV model, the counterpart of
the reference's k8 prototype (misc/test-qv.js): read the `CT` rows of a
`yak qv` / `yak_tpu qv` report and re-derive the adjusted QV with its
own Gauss-Jordan + degree-2 polynomial fit, so the production solver
(yak_tpu.models.qv.qv_solve) has an external oracle.

Like the prototype (test-qv.js:73,150) this hard-codes f = 8e-5 and
k = 31.  Usage: yak_tpu qv sr.yak asm.fa | python misc/test_qv.py
"""

import math
import sys

import numpy as np

F = 0.00008
K = 31


def main(fp):
    a = {}
    for line in fp:
        t = line.rstrip("\n").split("\t")
        if t and t[0] == "CT":
            a[int(t[1])] = (int(t[2]), float(t[3].replace("nan", "0")))
    n = max(a) + 1
    sr = np.array([a.get(i, (0, 0))[0] for i in range(n)], float)
    asm = np.array([a.get(i, (0, 0))[1] for i in range(n)], float)

    sum_asm = asm.sum()
    max_q = int(np.argmax(asm[: n - 1]))
    r = asm[max_q] / sr[max_q]

    # remove the short-read sampling error below the peak
    b = asm.copy()
    for i in range(2, n):
        if i <= max_q:
            y = (r * sr[i] - asm[i]) / (r - F)
            z = max(sr[i] - y, 0.0)
            b[i] = r * z
    min_q, min_cnt = max_q, asm[max_q]
    for i in range(max_q, 1, -1):     # downward scan like the prototype
        if min_cnt > asm[i]:
            min_cnt, min_q = asm[i], i
    if asm[max_q] - asm[min_q] + 1 < 5:
        raise SystemExit("ERROR: not enough points")

    # degree-2 fit of adjacent ratios over <= 8 points from the valley
    cap = min(max_q, min_q + 8)
    x = np.arange(min_q, cap, dtype=float)
    y = b[min_q + 1 : cap + 1] / b[min_q:cap]
    A = np.empty((3, 3))
    B = np.empty(3)
    for i in range(3):
        for j in range(3):
            A[i][j] = (x ** (i + j)).sum()
        B[i] = ((x**i) * y).sum()
    coef = np.linalg.solve(A, B)

    # extrapolate the error tail below the valley
    for i in range(min_q - 1, -1, -1):
        ratio = max(coef[0] + coef[1] * i + coef[2] * i * i, 1.0)
        b[i] = b[i + 1] / ratio

    sum_asm2 = b.sum()
    qv = -4.343 * math.log(math.log(sum_asm / sum_asm2) / K)
    print(f"{sum_asm - sum_asm2:g} {qv:g}")


if __name__ == "__main__":
    main(open(sys.argv[1]) if len(sys.argv) > 1 else sys.stdin)
