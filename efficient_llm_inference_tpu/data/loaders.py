"""Dataset loaders for benchmarking.

Behavioral re-implementation of /root/reference/src/datasets/loaders.py with
the same classes, prompt templates, and accessors. When the HuggingFace hub
is unreachable (this environment has no network), loaders fall back to the
bundled offline samples in data/samples.py so every harness still runs
end-to-end; set `offline=False` to force a hub error instead.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from .samples import MMLU_SAMPLES, SUMMARIZATION_SAMPLES


def _try_hf_load(*args, **kwargs):
    try:
        from datasets import load_dataset  # type: ignore

        return load_dataset(*args, **kwargs)
    except Exception:
        return None


class SummarizationDataset:
    """CNN/DailyMail, XSum, SAMSum wrapper (reference loaders.py:8-131)."""

    def __init__(
        self,
        dataset_name: str = "cnn_dailymail",
        version: str = "3.0.0",
        split: str = "test",
        max_samples: Optional[int] = None,
        offline_fallback: bool = True,
    ):
        self.dataset_name = dataset_name
        self.version = version
        self.split = split
        self.max_samples = max_samples
        self.offline_fallback = offline_fallback
        self._load_dataset()

    def _load_dataset(self):
        print(f"Loading {self.dataset_name} ({self.split} split)...")
        keys = {
            "cnn_dailymail": ("article", "highlights"),
            "xsum": ("document", "summary"),
            "samsum": ("dialogue", "summary"),
        }
        if self.dataset_name not in keys:
            raise ValueError(f"Unknown dataset: {self.dataset_name}")
        self.article_key, self.summary_key = keys[self.dataset_name]

        if self.dataset_name == "cnn_dailymail":
            ds = _try_hf_load("cnn_dailymail", self.version, split=self.split)
        else:
            ds = _try_hf_load(self.dataset_name, split=self.split)

        if ds is not None:
            self._records = [
                (s[self.article_key], s[self.summary_key]) for s in ds
            ]
            self._source = "hf"
        elif self.offline_fallback:
            self._records = list(SUMMARIZATION_SAMPLES[self.dataset_name])
            self._source = "bundled"
            print(
                f"(hub unreachable — using {len(self._records)} bundled "
                f"offline samples)"
            )
        else:
            raise RuntimeError(f"Could not load {self.dataset_name} from the hub")

        if self.max_samples is not None:
            self._records = self._records[: self.max_samples]
        print(f"Loaded {len(self._records)} samples")

    @classmethod
    def from_records(
        cls, records: List[Tuple[str, str]], name: str = "custom"
    ) -> "SummarizationDataset":
        """Wrap pre-built (article, summary) pairs (e.g. corpus-mined
        held-out tasks, data/corpus_tasks.py) in the dataset interface."""
        self = cls.__new__(cls)
        self.dataset_name = name
        self.version = ""
        self.split = "custom"
        self.max_samples = None
        self.offline_fallback = False
        self.article_key, self.summary_key = "article", "highlights"
        self._records = list(records)
        self._source = "records"
        return self

    def __len__(self) -> int:
        return len(self._records)

    def __getitem__(self, idx: int) -> Tuple[str, str]:
        return self._records[idx]

    def get_batch(self, indices: List[int]) -> Tuple[List[str], List[str]]:
        articles = [self._records[i][0] for i in indices]
        summaries = [self._records[i][1] for i in indices]
        return articles, summaries

    def get_samples(self, n: int, offset: int = 0) -> Tuple[List[str], List[str]]:
        end = min(offset + n, len(self._records))
        return self.get_batch(list(range(offset, end)))

    def create_prompts(
        self,
        articles: List[str],
        instruction: str = "Summarize the following article:\n\n",
        max_article_length: Optional[int] = None,
    ) -> List[str]:
        """Prompt template per reference loaders.py:110-131."""
        prompts = []
        for article in articles:
            if max_article_length is not None:
                article = article[:max_article_length]
            prompts.append(f"{instruction}{article}\n\nSummary:")
        return prompts


def load_cnn_dailymail(split: str = "test", max_samples: Optional[int] = 100):
    return SummarizationDataset(
        dataset_name="cnn_dailymail", version="3.0.0", split=split, max_samples=max_samples
    )


def load_xsum(split: str = "test", max_samples: Optional[int] = 100):
    return SummarizationDataset(dataset_name="xsum", split=split, max_samples=max_samples)


def load_samsum(split: str = "test", max_samples: Optional[int] = 100):
    return SummarizationDataset(dataset_name="samsum", split=split, max_samples=max_samples)


# Reference's 57-subject list (loaders.py:244-265) — first 5 loaded by default.
MMLU_SUBJECTS = [
    "abstract_algebra", "anatomy", "astronomy", "business_ethics",
    "clinical_knowledge", "college_biology", "college_chemistry",
    "college_computer_science", "college_mathematics", "college_physics",
    "computer_security", "conceptual_physics", "econometrics",
    "electrical_engineering", "elementary_mathematics", "formal_logic",
    "global_facts", "high_school_biology", "high_school_chemistry",
    "high_school_computer_science", "high_school_european_history",
    "high_school_geography", "high_school_government_and_politics",
    "high_school_macroeconomics", "high_school_mathematics",
    "high_school_microeconomics", "high_school_physics",
    "high_school_psychology", "high_school_statistics",
    "high_school_us_history", "high_school_world_history",
    "human_aging", "human_sexuality", "international_law",
    "jurisprudence", "logical_fallacies", "machine_learning",
    "management", "marketing", "medical_genetics", "miscellaneous",
    "moral_disputes", "moral_scenarios", "nutrition", "philosophy",
    "prehistory", "professional_accounting", "professional_law",
    "professional_medicine", "professional_psychology", "public_relations",
    "security_studies", "sociology", "us_foreign_policy", "virology",
    "world_religions",
]


class MMLUDataset:
    """MMLU wrapper (reference loaders.py:195-401) with offline fallback."""

    def __init__(
        self,
        split: str = "test",
        subject: Optional[str] = None,
        max_samples: Optional[int] = None,
        offline_fallback: bool = True,
    ):
        self.split = split
        self.subject = subject
        self.max_samples = max_samples
        self.offline_fallback = offline_fallback
        self._load_dataset()

    def _load_dataset(self):
        print(f"Loading MMLU dataset ({self.split} split)...")
        records = []
        split_name = (
            "validation" if self.split in ("dev", "validation") else "test"
        )
        subjects = [self.subject] if self.subject else MMLU_SUBJECTS[:5]
        for subj in subjects:
            ds = _try_hf_load("cais/mmlu", subj, split=split_name)
            if ds is None:
                continue
            for s in ds:
                records.append(self._normalize(s))

        if records:
            self._source = "hf"
        elif self.offline_fallback:
            records = list(MMLU_SAMPLES)
            self._source = "bundled"
            print(f"(hub unreachable — using {len(records)} bundled offline samples)")
        else:
            raise RuntimeError("Failed to load any MMLU subjects")

        if self.max_samples is not None:
            records = records[: self.max_samples]
        self._records = records
        print(f"Loaded {len(self._records)} samples")

    @staticmethod
    def _normalize(sample) -> Tuple[str, List[str], int]:
        """Handle choices-as-dict/list/columns (reference loaders.py:309-325)."""
        question = sample["question"]
        if "choices" in sample:
            ch = sample["choices"]
            if isinstance(ch, dict):
                choices = [ch["A"], ch["B"], ch["C"], ch["D"]]
            elif isinstance(ch, list):
                choices = ch
            else:
                raise ValueError(f"Unexpected choices format: {type(ch)}")
        else:
            choices = [sample["A"], sample["B"], sample["C"], sample["D"]]
        answer = sample["answer"]
        if isinstance(answer, str):
            answer = ord(answer.upper()) - ord("A")
        return question, choices, int(answer)

    @classmethod
    def from_records(
        cls, records: List[Tuple[str, List[str], int]]
    ) -> "MMLUDataset":
        """Wrap pre-built (question, choices, answer) triples (e.g.
        corpus-mined held-out tasks, data/corpus_tasks.py)."""
        self = cls.__new__(cls)
        self.split = "custom"
        self.subject = None
        self.max_samples = None
        self.offline_fallback = False
        self._records = list(records)
        self._source = "records"
        return self

    def __len__(self) -> int:
        return len(self._records)

    def __getitem__(self, idx: int) -> Tuple[str, List[str], int]:
        return self._records[idx]

    def get_batch(self, indices: List[int]):
        questions = [self._records[i][0] for i in indices]
        choices_list = [self._records[i][1] for i in indices]
        answers = [self._records[i][2] for i in indices]
        return questions, choices_list, answers

    def get_samples(self, n: int, offset: int = 0):
        end = min(offset + n, len(self._records))
        return self.get_batch(list(range(offset, end)))

    def create_prompts(
        self,
        questions: List[str],
        choices_list: List[List[str]],
        instruction: str = "The following are multiple choice questions (with answers).\n\n",
    ) -> List[str]:
        """Prompt template per reference loaders.py:376-400."""
        prompts = []
        for question, choices in zip(questions, choices_list):
            prompt = f"{instruction}Question: {question}\n\n"
            prompt += "Choices:\n"
            for i, choice in enumerate(choices):
                prompt += f"{chr(ord('A') + i)}. {choice}\n"
            prompt += "\nAnswer:"
            prompts.append(prompt)
        return prompts


def load_mmlu(
    split: str = "test",
    subject: Optional[str] = None,
    max_samples: Optional[int] = 100,
):
    return MMLUDataset(split=split, subject=subject, max_samples=max_samples)
