"""Label-fusion rules for combining per-path predictions into one verdict.

Exact semantics of the reference demo (reference src/demo/app.py:313-371):
  * get_final_classification: two-stage path agreement — resolve (text_text,
    image_image) first; if still NEI, resolve (text_image, image_text);
    a pair resolves when both agree on support/refute or one is NEI and the
    other decisive.
  * determine_final_classification: corpus-level majority vote over
    per-evidence final labels; support==refute or no decisive votes -> NEI.

These same rules repair the reference's broken unified eval (its
eval_models.py:92-100 calls functions that were never defined).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable, List, Optional, Sequence, Tuple

SUPPORT = "support"
REFUTE = "refute"
NEI = "not_enough_information"
LABELS = (SUPPORT, NEI, REFUTE)   # index order matches idx_to_label


def resolve_classification(val1: Optional[str], val2: Optional[str]) -> str:
    decisive = {SUPPORT, REFUTE}
    if val1 == val2 and val1 in decisive:
        return val1
    if (val1 in decisive and val2 == NEI) or (val2 in decisive and val1 == NEI):
        return val1 if val1 != NEI else val2
    return NEI


def get_final_classification(results: Sequence[Optional[str]]) -> str:
    """results: (text_text, text_image, image_text, image_image) labels."""
    text_text, text_image, image_text, image_image = results
    final = resolve_classification(text_text, image_image)
    if final != NEI:
        return final
    final = resolve_classification(text_image, image_text)
    if final != NEI:
        return final
    return NEI


def determine_final_classification(
    final_labels: Iterable[Optional[str]],
) -> Tuple[str, List[int]]:
    """Majority vote over per-evidence final labels. Returns
    (label, 1-based contributing indices). Ties and all-NEI -> NEI."""
    counts: Counter = Counter()
    index_mapping: dict[str, list[int]] = {SUPPORT: [], REFUTE: [], NEI: []}
    for idx, label in enumerate(final_labels):
        if label:
            counts[label] += 1
            index_mapping[label].append(idx + 1)

    support, refute = counts[SUPPORT], counts[REFUTE]
    if support == 0 and refute == 0:
        final = NEI
    elif support == refute:
        final = NEI
    else:
        final = SUPPORT if support > refute else REFUTE
    return final, index_mapping[final]
