"""Config layer (SURVEY O37): defaults, YAML load, deep merge, env
overrides, validation — mirrors reference loader/settings semantics."""

import pytest

from hybrid_cdc_demo_spark.config import (
    CDCSettings,
    ConfigError,
    deep_merge,
    env_overrides,
    load_config,
)


def test_reference_defaults():
    s = load_config()
    assert s.pipeline.batch_size == 100
    assert s.pipeline.max_parallelism == 4
    assert s.pipeline.max_in_flight_batches == 10
    assert s.pipeline.poll_interval_seconds == 0.1
    assert s.retry.max_attempts == 5
    assert s.retry.base_delay_seconds == 0.1
    assert s.retry.multiplier == 2.0
    assert s.retry.max_delay_seconds == 30.0
    assert s.retry.jitter_fraction == 0.25
    assert "email" in s.masking.pii_fields
    assert "patient_id" in s.masking.phi_fields
    assert s.sinks.delete_policy_append == "skip"


def test_deep_merge_nested_vs_overwrite():
    base = {"a": {"x": 1, "y": 2}, "lst": [1, 2], "s": "keep"}
    override = {"a": {"y": 20, "z": 30}, "lst": [9]}
    merged = deep_merge(base, override)
    assert merged == {"a": {"x": 1, "y": 20, "z": 30}, "lst": [9], "s": "keep"}


def test_yaml_file_and_env_precedence(tmp_path):
    cfg = tmp_path / "cdc.yaml"
    cfg.write_text(
        "keyspace: shop\npipeline:\n  batch_size: 250\nretry:\n  max_attempts: 3\n"
    )
    s = load_config(
        cfg,
        environ={"CDC_PIPELINE__BATCH_SIZE": "500", "CDC_MASKING__SECRET_KEY": "k2"},
    )
    assert s.keyspace == "shop"
    assert s.pipeline.batch_size == 500  # env beats file
    assert s.retry.max_attempts == 3  # file beats default
    assert s.masking.secret_key == "k2"


def test_env_override_parsing():
    env = {
        "CDC_SINKS__CLICKHOUSE_ENABLED": "false",
        "CDC_MASKING__PII_FIELDS": "email,iban",
        "OTHER_VAR": "ignored",
    }
    tree = env_overrides(env)
    assert tree == {
        "sinks": {"clickhouse_enabled": "false"},
        "masking": {"pii_fields": "email,iban"},
    }
    s = load_config(environ=env)
    assert s.sinks.clickhouse_enabled is False
    assert s.masking.pii_fields == ["email", "iban"]


def test_unknown_key_rejected(tmp_path):
    cfg = tmp_path / "bad.yaml"
    cfg.write_text("pipelin:\n  batch_size: 10\n")
    with pytest.raises(ConfigError, match="unknown config key"):
        load_config(cfg)


def test_validation_bounds():
    with pytest.raises(ConfigError, match="batch_size"):
        load_config(overrides={"pipeline": {"batch_size": 0}})
    with pytest.raises(ConfigError, match="delete_policy_append"):
        load_config(overrides={"sinks": {"delete_policy_append": "drop"}})
    with pytest.raises(ConfigError, match="jitter"):
        load_config(overrides={"retry": {"jitter_fraction": 2.0}})


def test_settings_drive_pipeline_types():
    s = CDCSettings()
    from hybrid_cdc_demo_spark.functions.masking import MaskingRules
    from hybrid_cdc_demo_spark.streaming.retry import RetryPolicy

    rules = MaskingRules(
        pii_fields=s.masking.pii_fields,
        phi_fields=s.masking.phi_fields,
        secret_key=s.masking.secret_key,
    )
    policy = RetryPolicy(
        max_attempts=s.retry.max_attempts,
        base_delay_seconds=s.retry.base_delay_seconds,
        multiplier=s.retry.multiplier,
        max_delay_seconds=s.retry.max_delay_seconds,
        jitter_fraction=s.retry.jitter_fraction,
    )
    assert policy.max_attempts == 5 and rules.secret_key == "default-secret-key"
