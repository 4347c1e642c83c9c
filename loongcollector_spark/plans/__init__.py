"""Plan-level components: the config→DataFrame compiler (the analog of
CollectionPipeline::Init building a plugin chain from YAML/JSON config,
core/collection_pipeline/CollectionPipeline.cpp:121-261) and the
checkpoint/resume manifest."""
