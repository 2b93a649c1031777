from baker_spark.plans.toml_compiler import compile_toml, compile_toml_file  # noqa: F401
