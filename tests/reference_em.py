"""Reference-literal dict SQUAREM — the parity ORACLE for the shipped
vectorized EM (hgtpu/typer/em.py).

This is a deliberate near-transcription of the reference's
single_abundance / next_prob / prob_diff
(hisatgenotype_typing_common.py:1267-1410) kept OUT of the shipped
package (VERDICT r3 item 9): production code contains only the
re-expressed float64 vectorized solver; the differential tests here pin
it against this dict-shaped original."""
from __future__ import annotations

import math


def prob_diff(prob1: dict, prob2: dict) -> float:
    diff = 0.0
    for allele in prob1:
        if allele in prob2:
            diff += abs(prob1[allele] - prob2[allele])
        else:
            diff += prob1[allele]
    return diff


def single_abundance_dict(cmpt_counts: dict,
                          remove_low_abundance_allele: bool = False,
                          lengths: dict = None):
    """cmpt_counts: {'A1-A2-A3': count}.  Returns [[allele, prob], ...]
    sorted by prob desc — the reference's exact dict-shaped SQUAREM."""
    lengths = lengths or {}

    def normalize(prob):
        total = sum(prob.values())
        for a in prob:
            prob[a] /= total

    def normalize_len(prob):
        total = sum(m / lengths[a] for a, m in prob.items())
        for a, m in prob.items():
            prob[a] = m / lengths[a] / total

    norm = normalize_len if lengths else normalize

    prob = {}
    for cmpt, count in cmpt_counts.items():
        alleles = cmpt.split("-")
        for a in alleles:
            prob[a] = prob.get(a, 0.0) + float(count) / len(alleles)
    norm(prob)

    def next_prob(prob):
        nxt = {}
        for cmpt, count in cmpt_counts.items():
            alleles = cmpt.split("-")
            denom = sum(prob.get(a, 0.0) for a in alleles)
            if denom <= 0.0:
                continue
            for a in alleles:
                if a not in prob:
                    continue
                nxt[a] = nxt.get(a, 0.0) + float(count) * prob[a] / denom
        norm(nxt)
        return nxt

    def select_alleles(prob):
        if not prob:
            return prob
        mx = max(prob.values())
        return {a: p for a, p in prob.items() if p >= mx / 10.0}

    diff = 1.0
    it = 0
    while diff > 0.0001 and it < 1000:
        nxt = next_prob(prob)
        # SQUAREM acceleration (ref: typing_common.py:1353-1383)
        nxt2 = next_prob(nxt)
        sum_sq_r = sum_sq_v = 0.0
        p_r, p_v = {}, {}
        for a in prob:
            p_r[a] = nxt[a] - prob[a]
            sum_sq_r += p_r[a] * p_r[a]
            p_v[a] = nxt2[a] - nxt[a] - p_r[a]
            sum_sq_v += p_v[a] * p_v[a]
        if sum_sq_v > 0.0:
            gamma = -math.sqrt(sum_sq_r / sum_sq_v)
            accel = {
                a: max(0.0,
                       prob[a] - 2 * gamma * p_r[a] + gamma * gamma * p_v[a])
                for a in prob
            }
            nxt = next_prob(accel)
        diff = prob_diff(prob, nxt)
        prob = nxt
        if it >= 10 and remove_low_abundance_allele:
            prob = select_alleles(prob)
        it += 1

    if remove_low_abundance_allele:
        prob = select_alleles(prob)
    norm(prob)
    out = sorted(([a, p] for a, p in prob.items()),
                 key=lambda x: x[1], reverse=True)
    return out
