"""Multiple-choice accuracy evaluation (MMLU).

Behavioral re-implementation of /root/reference/src/evaluation/accuracy.py:
the same four answer-extraction fallback tiers (leading letter,
parenthesized, "answer is X" phrasings, standalone letter in the first 50
chars) and the same overall / per-choice accuracy accounting.
"""

from __future__ import annotations

import re
from typing import List, Tuple


class AccuracyEvaluator:
    """Evaluator for multiple-choice question accuracy."""

    def extract_answer(self, text: str) -> str:
        """Extract 'A'-'D' from generated text (reference accuracy.py:14-58)."""
        text = text.strip()

        m = re.search(r"^([ABCD])[\.\)\s,;:]*", text, re.IGNORECASE)
        if m:
            return m.group(1).upper()

        m = re.search(r"[\(\[]([ABCD])[\)\]]", text, re.IGNORECASE)
        if m:
            return m.group(1).upper()

        for pattern in (
            r"answer[:\s]+([ABCD])",
            r"the\s+answer\s+is\s+([ABCD])",
            r"correct\s+answer[:\s]+([ABCD])",
            r"choice\s+([ABCD])",
        ):
            m = re.search(pattern, text, re.IGNORECASE)
            if m:
                return m.group(1).upper()

        m = re.search(r"\b([ABCD])\b", text[:50], re.IGNORECASE)
        if m:
            return m.group(1).upper()

        return ""

    def compute_accuracy(
        self, predictions: List[str], references: List[int]
    ) -> Tuple[float, List[bool], List[str]]:
        """(accuracy, correctness, extracted) — reference accuracy.py:60-95."""
        assert len(predictions) == len(references), (
            f"Mismatch: {len(predictions)} predictions vs {len(references)} references"
        )
        correct, extracted = [], []
        for pred, ref_idx in zip(predictions, references):
            letter = self.extract_answer(pred)
            extracted.append(letter)
            correct.append(letter == chr(ord("A") + ref_idx))
        accuracy = sum(correct) / len(correct) if correct else 0.0
        return accuracy, correct, extracted

    def compute_accuracy_by_choice(
        self, predictions: List[str], references: List[int]
    ) -> dict:
        """Per-choice breakdown — reference accuracy.py:97-138."""
        accuracy, correct, extracted = self.compute_accuracy(predictions, references)
        choice_counts = {c: 0 for c in "ABCD"}
        choice_correct = {c: 0 for c in "ABCD"}
        for ext, _ref_idx, is_corr in zip(extracted, references, correct):
            if ext in choice_counts:
                choice_counts[ext] += 1
                if is_corr:
                    choice_correct[ext] += 1
        choice_accuracy = {
            c: (choice_correct[c] / choice_counts[c] if choice_counts[c] else 0.0)
            for c in "ABCD"
        }
        return {
            "overall_accuracy": accuracy,
            "choice_accuracy": choice_accuracy,
            "choice_counts": choice_counts,
            "correctness": correct,
            "extracted_answers": extracted,
        }
