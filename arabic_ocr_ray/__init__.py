"""arabic_ocr_ray — a Ray-Data-native web-text extraction engine.

Re-realizes the document pipeline of the reference OCR engine
(Kareem-Emad/arabic-ocr) as the analogous main-content web-extraction
stages over a Parquet corpus of Common-Crawl-style pages:

    reference stage (file:line in /root/reference)   →  this engine's stage
    ------------------------------------------------    -------------------------------
    binarize+invert        utils.py:35-39            →  HTML decode + strip script/style
    deskew                 preprocess.py:33-51       →  wrapper-depth normalization
    horizontal projection  preprocess.py:14-20       →  text-density profile over rows
    line segmentation      segment_words.py:15-75    →  block (line) segmentation
    vertical projection    preprocess.py:23-30       →  per-token char-weight profile
    adaptive word gaps     utils.py:42-60            →  adaptive span-gap threshold
    baseline detection     preprocess.py:8-11        →  dominant-depth ("baseline") path
    contour fine cuts      preprocess.py:272-475     →  structural sub-span cuts
    feature extraction     train_recognition.py:274+ →  9-slot span feature vectors
    bucket-NN prediction   integrator.py:181-200     →  content/boilerplate classifier
    word assembly          segment_words.py:162-206  →  span assembly → extracted_text

Everything is expressed Ray-Data-first: ``ray.data.read_parquet`` →
``map_batches`` over Arrow batches (actor pools for the model-holding
classifier stage) → ``write_parquet``, streaming end to end.  Nothing in
this package calls ``ray.init``/``ray.shutdown`` — sessions are owned by
the caller (tests' conftest fixture, bench.py, CLI).
"""

__version__ = "0.1.0"
