from baker_spark.plans.toml_compiler import (  # noqa: F401
    UserDesc,
    compile_toml,
    compile_toml_file,
)
