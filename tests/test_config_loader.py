"""Config-driven gateway assembly (config.py — reference
`server/config/__init__.py` + the `_target_`/interpolation YAML
convention of `server/config/gateway/*.yaml`)."""

import os

import pytest
from pyspark.sql import types as T

from csp_gateway_spark.catalog import ChannelCatalog, Gateway, GatewayModule
from csp_gateway_spark.config import instantiate, load_config, load_gateway

QUOTE = T.StructType([T.StructField("sym", T.StringType()), T.StructField("px", T.DoubleType())])


class QuoteModule(GatewayModule):
    """Demo module usable from YAML (_target_ points here)."""

    channel: str = "quotes"
    seed_rows: int = 2

    def connect(self, channels: ChannelCatalog) -> None:
        channels.declare(self.channel, QUOTE)
        channels.declare_state(self.channel, "sym")
        channels.send(
            self.channel, [{"sym": f"S{i}", "px": float(i)} for i in range(self.seed_rows)]
        )


CONFIG_YAML = """
port: 8123

modules:
  quotes:
    _target_: tests.test_config_loader.QuoteModule
    seed_rows: 3
  disabled_one:
    _target_: tests.test_config_loader.QuoteModule
    channel: ignored
    disable: true

settings:
  port: ${port}
  host: ${env:DEMO_HOST,"0.0.0.0"}

gateway:
  _target_: csp_gateway_spark.catalog.Gateway
  modules:
    - /modules/quotes
    - /modules/disabled_one
"""


@pytest.fixture()
def cfg_file(tmp_path):
    p = tmp_path / "app.yaml"
    p.write_text(CONFIG_YAML)
    return str(p)


def test_interpolation_and_env(cfg_file, monkeypatch):
    cfg = load_config(cfg_file)
    assert cfg["settings"]["port"] == 8123
    assert cfg["settings"]["host"] == "0.0.0.0"  # env default
    monkeypatch.setenv("DEMO_HOST", "10.1.2.3")
    assert load_config(cfg_file)["settings"]["host"] == "10.1.2.3"


def test_overrides_dotted_paths(cfg_file):
    cfg = load_config(cfg_file, overrides=["port=9999", "modules.quotes.seed_rows=5", "+extra.flag=true"])
    assert cfg["settings"]["port"] == 9999
    assert cfg["modules"]["quotes"]["seed_rows"] == 5
    assert cfg["extra"]["flag"] is True


def test_load_gateway_builds_and_runs(cfg_file, spark):
    gw = load_gateway(cfg_file)
    assert isinstance(gw, Gateway)
    assert len(gw.modules) == 2 and gw.modules[1].disable
    catalog = gw.build(spark)
    rows = {r["sym"]: r["px"] for r in catalog.query("quotes", None).collect()}
    assert rows == {"S0": 0.0, "S1": 1.0, "S2": 2.0}
    assert "ignored" not in catalog._producers  # disabled module skipped


def test_registry_reference_instantiates_in_place():
    cfg = load_config({"a": {"_target_": "tests.test_config_loader.QuoteModule", "seed_rows": 7},
                       "uses": ["/a"]})
    built = instantiate(cfg["uses"], cfg)
    # note: the _target_ dotted import yields the same class under a
    # different module identity than pytest's own import — compare by name
    assert type(built[0]).__name__ == "QuoteModule" and built[0].seed_rows == 7


def test_missing_gateway_key_raises(cfg_file):
    with pytest.raises(KeyError, match="nope"):
        load_gateway(cfg_file, key="nope")


def test_bad_target_raises():
    with pytest.raises(ValueError, match="dotted path"):
        instantiate({"_target_": "nodots"})


def test_cli_once_smoke(cfg_file, spark):
    """`python -m csp_gateway_spark --config ... --once` builds and
    serves (the csp-gateway-start equivalent)."""
    from csp_gateway_spark.__main__ import main

    assert main(["--config", cfg_file, "--once", "-o", "modules.quotes.seed_rows=1"]) == 0


def test_interpolation_inside_strings(tmp_path):
    cfg = load_config({"host": "h1", "port": 9, "url": "http://${host}:${port}/x"})
    assert cfg["url"] == "http://h1:9/x"


def test_chained_interpolation_resolves_transitively(monkeypatch):
    """a: ${b}, b: ${env:VAR} must resolve to the env value, not the
    literal '${env:VAR}' string (hydra/OmegaConf resolve transitively)."""
    monkeypatch.setenv("CFG_CHAIN_VAR", "resolved-value")
    cfg = load_config({"b": "${env:CFG_CHAIN_VAR}", "a": "${b}", "c": "${a}"})
    assert cfg["a"] == "resolved-value"
    assert cfg["c"] == "resolved-value"


def test_chained_interpolation_through_nested_dict():
    cfg = load_config({"base": {"host": "${top}"}, "top": "h9", "url": "${base.host}:1"})
    assert cfg["url"] == "h9:1"


def test_interpolation_cycle_raises():
    with pytest.raises(ValueError, match="cycle"):
        load_config({"a": "${b}", "b": "${a}"})
