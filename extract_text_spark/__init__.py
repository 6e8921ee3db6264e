"""extract_text_spark — a PySpark-native multi-format text-extraction engine.

A from-scratch reimplementation of the observable extraction semantics of
the reference service (``GoGoButters/extract-text``) as a distributed Spark
pipeline over tables of interleaved text+media documents:

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)
        -> extracted(doc_id, spans<kind in {text,heading,table,code,media}>,
                     status, metrics...)

Design (see SURVEY.md for the full blueprint):

* **DataFrame-first.** Scan, validation, archive fan-out, checkpoint
  anti-joins, salting and manifest writes are all Catalyst-planned
  DataFrame ops (``from_json``/``explode``/``filter``/joins) — JVM-side.
* **Extraction kernels are pure Python string transforms** (the reference
  is a Python string-transform service), executed as Arrow-batched
  ``mapInPandas`` (iterator form) — never per-row Python UDFs.
* **Scale levers**: salted repartition by doc_id, span-chunk splitting for
  oversized documents (skew), byte-aware Arrow batching, bucket-level
  checkpoint manifests with left-anti-join resume.
"""

__version__ = "0.1.0"
