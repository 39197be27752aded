"""Engine configuration.

Mirrors the declarative surface of the reference's YAML config
(``/root/reference/inputs/input_dfm.yaml``, loaded at
``DeezyMatch/utils.py:514-560``) as a typed dataclass tree, with the
Ray-specific execution knobs (concurrency, batch sizes, blocking/skew
policy) that the reference — a single-process library — does not have.

Defaults follow the reference YAML defaults so that a user switching over
gets the same preprocessing/tokenization/model semantics out of the box.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class PreprocessingConfig:
    """Reference: ``preprocessing:`` block (input_dfm.yaml:9-21)."""

    uni2ascii: bool = True
    lowercase: bool = True
    strip: bool = True
    only_latin_letters: bool = False
    # Row is kept iff (chars found in vocab) / (total chars) >= threshold
    # (data_processing.py:196-212).
    missing_char_threshold: float = 0.5


@dataclass(frozen=True)
class TokenizationConfig:
    """Reference: ``gru_lstm.mode:`` block (input_dfm.yaml:26-44)."""

    tokenize: tuple[str, ...] = ("char", "ngram")
    prefix_suffix: tuple[str, str] = ("<", ">")
    min_gram: int = 2
    max_gram: int = 3
    token_sep: str = "default"
    max_seq_len: int = 120


@dataclass(frozen=True)
class ModelConfig:
    """Reference: ``gru_lstm:`` block (input_dfm.yaml:24-91)."""

    main_architecture: str = "gru"  # rnn | gru (lstm not implemented: no torch)
    bidirectional: bool = True
    num_layers: int = 2
    embedding_dim: int = 60
    rnn_hidden_dim: int = 60
    fc1_out_dim: int = 120
    output_dim: int = 2
    pooling_mode: str = "hstates_layers_simple"
    rnn_dropout: float = 0.01
    fc_dropout: tuple[float, float] = (0.01, 0.01)
    att_dropout: tuple[float, float] = (0.01, 0.01)
    bias: bool = True
    learning_rate: float = 0.001
    epochs: int = 5
    batch_size: int = 256
    dl_shuffle: bool = True
    random_seed: int = 123
    early_stopping_patience: int = -1
    validation: int = 1
    train_proportion: float = 0.7
    val_proportion: float = 0.15
    test_proportion: float = 0.15
    layers_to_freeze: tuple[str, ...] = ("emb", "rnn_1", "attn")


@dataclass(frozen=True)
class BlockingConfig:
    """Blocking-stage policy (no reference equivalent: the reference's
    candidate_ranker brute-forces a global faiss index,
    candidateRanker.py:361-364; blocking is our scale path)."""

    # q-gram size for blocking keys, derived from the *bounded* normalized
    # string (same bounding as tokenization, utils.py:113-117).
    qgram: int = 3
    use_phonetic: bool = True
    # Blocks with more than this many members on one side are salted into
    # ceil(n / salt_target) sub-blocks (skew control; SURVEY §4).
    max_block_size: int = 512
    # Hard cap on pairs generated per (possibly salted) block; overflow is
    # counted in metrics, never dropped silently.
    max_pairs_per_block: int = 262_144
    # Self-join blocks larger than max_block_size are tile-salted into up
    # to this many groups (s(s+1)/2 tiles); blocks needing more tiles are
    # dropped and surfaced via block stats.
    salt_max_tiles: int = 32
    salt_hot_blocks: bool = True


@dataclass(frozen=True)
class RankingConfig:
    """Reference: candidate_ranker arguments (candidateRanker.py:186-295)."""

    ranking_metric: str = "faiss"  # faiss | cosine | conf
    selection_threshold: float = 10.0
    num_candidates: int = 10
    length_diff: int | None = None
    calc_predict: bool = False
    calc_cosine: bool = False


@dataclass(frozen=True)
class ExecutionConfig:
    """Ray Data execution knobs — per-stage sizing."""

    score_batch_size: int = 4096
    # Autoscaling actor-pool bounds (min, max): a fixed-size pool larger
    # than the cluster's free CPUs deadlocks Ray Data's ActorPoolMapOperator
    # while it waits for all actors to schedule; (1, N) starts work with
    # whatever fits and scales up to N as resources allow.
    score_concurrency: tuple[int, int] = (1, 8)
    read_override_num_blocks: int | None = None
    # hash-bucket count for fine-keyed groupbys (block keys, query ids,
    # pair dedup): bounds map_groups invocations and sets shuffle width
    shuffle_partitions: int = 64
    cluster_driver_edge_limit: int = 2_000_000  # below this, union-find on driver
    cluster_max_rounds: int = 50


@dataclass(frozen=True)
class EngineConfig:
    preprocessing: PreprocessingConfig = field(default_factory=PreprocessingConfig)
    tokenization: TokenizationConfig = field(default_factory=TokenizationConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    blocking: BlockingConfig = field(default_factory=BlockingConfig)
    ranking: RankingConfig = field(default_factory=RankingConfig)
    execution: ExecutionConfig = field(default_factory=ExecutionConfig)

    def replace(self, **kwargs: Any) -> "EngineConfig":
        return dataclasses.replace(self, **kwargs)


DEFAULT_CONFIG = EngineConfig()
