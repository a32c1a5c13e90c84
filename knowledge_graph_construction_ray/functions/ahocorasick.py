"""Pure-Python Aho-Corasick automaton for large-gazetteer mention scans.

Python ``re`` alternation ("name1|name2|...") retries alternatives per
position, so a scan costs O(text × gazetteer) in the worst case — fine for
hundreds of names (C-speed regex beats any pure-Python loop there), but it
degrades linearly with gazetteer size.  The automaton walks each character
once regardless of dictionary size: O(text + matches).

``find_leftmost_longest`` reproduces the EXACT semantics of the sorted
alternation regex the MentionDetector compiles (names sorted by length
desc): non-overlapping, leftmost match first, longest name at that start —
asserted equivalent by a randomized parity pytest.
"""

from __future__ import annotations

from collections import deque


class AhoCorasick:
    """Dict-transition automaton; build once per actor, scan per batch."""

    def __init__(self, names: "list[str]"):
        names = [n for n in names if n]
        self.goto: list[dict] = [{}]
        self.lens: list[tuple] = [()]  # name lengths ending at each state
        for name in names:
            s = 0
            for ch in name:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.lens.append(())
                    nxt = len(self.goto) - 1
                    self.goto[s][ch] = nxt
                s = nxt
            if len(name) not in self.lens[s]:
                self.lens[s] = self.lens[s] + (len(name),)
        # BFS failure links; merge suffix outputs so every name ending at a
        # position is reported from its state directly
        self.fail = [0] * len(self.goto)
        q: deque[int] = deque(self.goto[0].values())
        while q:
            r = q.popleft()
            for ch, s in self.goto[r].items():
                q.append(s)
                f = self.fail[r]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                cand = self.goto[f].get(ch, 0)
                self.fail[s] = cand if cand != s else 0
                if self.lens[self.fail[s]]:
                    merged = self.lens[s] + tuple(
                        l for l in self.lens[self.fail[s]] if l not in self.lens[s]
                    )
                    self.lens[s] = merged

    def find_all(self, text: str) -> "list[tuple[int, int]]":
        """All (start, end) matches, overlapping included."""
        out: list[tuple[int, int]] = []
        s = 0
        goto, fail, lens = self.goto, self.fail, self.lens
        for i, ch in enumerate(text):
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            if lens[s]:
                for l in lens[s]:
                    out.append((i - l + 1, i + 1))
        return out

    def find_leftmost_longest(self, text: str) -> "list[tuple[int, int]]":
        """Non-overlapping matches with the alternation-regex semantics:
        scan left to right, at the first matching position take the
        LONGEST name, resume after its end."""
        all_matches = self.find_all(text)
        if not all_matches:
            return []
        all_matches.sort(key=lambda m: (m[0], -(m[1] - m[0])))
        picked: list[tuple[int, int]] = []
        current_end = 0
        for start, end in all_matches:
            if start >= current_end:
                picked.append((start, end))
                current_end = end
        return picked
