"""Exact longest-common-substring length via suffix automaton.

Used to *verify* substring-duplicate candidates surfaced by the CDC
fingerprint pass: a candidate pair is a confirmed substring duplicate iff
LCS(text_a, text_b) >= substring_min_len. O(n + m) per pair (suffix
automaton of the shorter string, single scan of the longer), so verifying a
candidate pair costs the same as reading it.
"""

from __future__ import annotations


def longest_common_substring_len(a: str, b: str) -> int:
    if not a or not b:
        return 0
    if len(a) > len(b):
        a, b = b, a  # build the automaton over the shorter string

    # --- suffix automaton of `a` ---
    # state 0 is the initial state
    maxlen = [0]
    link = [-1]
    trans: list[dict[str, int]] = [{}]
    last = 0
    for ch in a:
        cur = len(maxlen)
        maxlen.append(maxlen[last] + 1)
        link.append(-1)
        trans.append({})
        p = last
        while p != -1 and ch not in trans[p]:
            trans[p][ch] = cur
            p = link[p]
        if p == -1:
            link[cur] = 0
        else:
            q = trans[p][ch]
            if maxlen[p] + 1 == maxlen[q]:
                link[cur] = q
            else:
                clone = len(maxlen)
                maxlen.append(maxlen[p] + 1)
                link.append(link[q])
                trans.append(dict(trans[q]))
                while p != -1 and trans[p].get(ch) == q:
                    trans[p][ch] = clone
                    p = link[p]
                link[q] = clone
                link[cur] = clone
        last = cur

    # --- scan `b` through the automaton ---
    best = 0
    v, length = 0, 0
    for ch in b:
        while v != 0 and ch not in trans[v]:
            v = link[v]
            length = maxlen[v]
        if ch in trans[v]:
            v = trans[v][ch]
            length += 1
            if length > best:
                best = length
        else:
            v, length = 0, 0
    return best
