"""Explicit StructType schemas for every table shape in the reference.

The reference has no schema system — types are implicit in extractor
code and re-inferred by `pd.read_csv` at each stage boundary
(`Preprocessing/Preprocessor.py:107-108`). Declaring them up front gives
fail-fast analysis, parquet schema pruning, and stable cross-stage
contracts. Ids are StringType: Instagram ids are 19-digit (overflow-safe
in int64 but CSV round-trips float them) and CrowdTangle `platformId` is
a composite string (SURVEY.md §1.2 note).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


S = T.StringType()
L = T.LongType()
D = T.DoubleType()
B = T.BooleanType()
TS = T.TimestampType()
ARR_S = T.ArrayType(T.StringType())


# posts table — feed-scrape metadata (`InstagramFeedScraper.py:189-221`,
# header confirmed in data.zip:Test_test/posts.csv; FIXTURES.md §1)
POSTS = T.StructType(
    [
        _f("id", S, False),
        _f("shortcode", S, False),
        _f("post_url", S),
        _f("type", S),
        _f("is_video", B),
        _f("likes", L),
        _f("comment_count", L),
        _f("comments_disabled", B),
        _f("search_mode", S),
        _f("search_term", S),
        _f("caption", S),
        _f("hashtags", ARR_S),
        _f("display_url", S),
        _f("owner_id", S),
        _f("timestamp", TS),
        _f("mentions", ARR_S),
        _f("thumbnail_src", S),
    ]
)

# Preprocessor output — exact 20-column projection+order of
# `Preprocessor.column_stuff` (`Preprocessor.py:156-158`) + index col id
POSTS_PREPROCESSED_COLUMNS = [
    "id",
    "city",
    "building",
    "year",
    "month",
    "day",
    "timestamp",
    "owner_id",
    "shortcode",
    "post_url",
    "type",
    "is_video",
    "interactions",
    "likes",
    "comment_count",
    "comments_disabled",
    "caption",
    "hashtags",
    "mentions",
    "image",
    "thumbnail_src",
    "scrape_image",
]

# raw post JSON — RapidAPI post response subset the extractors touch
# (`Scraper/RapidAPI/JsonInfo/PostJsonStructure.txt:1-48`,
# `InstagramPostScraper.py:287-348`; FIXTURES.md §3)
_EDGE_TEXT = T.StructType(
    [_f("edges", T.ArrayType(T.StructType([_f("node", T.StructType([_f("text", S)]))])))]
)
_COMMENT_NODE_FIELDS = [
    _f("id", S),
    _f("text", S),
    _f("owner", T.StructType([_f("username", S)])),
    _f("edge_liked_by", T.StructType([_f("count", L)])),
]
_THREADED = T.StructType(
    [
        _f(
            "edges",
            T.ArrayType(T.StructType([_f("node", T.StructType(_COMMENT_NODE_FIELDS))])),
        )
    ]
)
_COMMENT_NODE = T.StructType(_COMMENT_NODE_FIELDS + [_f("edge_threaded_comments", _THREADED)])

POST_JSON = T.StructType(
    [
        _f("__typename", S),
        _f("id", S),
        _f("shortcode", S),
        _f("display_url", S),
        _f("accessibility_caption", S),
        _f("is_video", B),
        _f("caption_is_edited", B),
        _f("has_ranked_comments", B),
        _f("like_and_view_counts_disabled", B),
        _f("comments_disabled", B),
        _f("is_affiliate", B),
        _f("is_paid_partnership", B),
        _f("is_ad", B),
        _f("taken_at_timestamp", L),
        _f("edge_media_to_caption", _EDGE_TEXT),
        _f("edge_media_preview_like", T.StructType([_f("count", L)])),
        _f(
            "edge_media_to_parent_comment",
            T.StructType(
                [
                    _f("count", L),
                    _f("edges", T.ArrayType(T.StructType([_f("node", _COMMENT_NODE)]))),
                ]
            ),
        ),
        _f(
            "edge_media_to_tagged_user",
            T.StructType(
                [
                    _f(
                        "edges",
                        T.ArrayType(
                            T.StructType(
                                [_f("node", T.StructType([_f("user", T.StructType([_f("username", S)]))]))]
                            )
                        ),
                    )
                ]
            ),
        ),
        _f(
            "edge_sidecar_to_children",
            T.StructType(
                [
                    _f(
                        "edges",
                        T.ArrayType(
                            T.StructType(
                                [_f("node", T.StructType([_f("id", S), _f("shortcode", S), _f("display_url", S)]))]
                            )
                        ),
                    )
                ]
            ),
        ),
        _f("location", T.StructType([_f("id", S), _f("name", S), _f("slug", S)])),
        _f(
            "owner",
            T.StructType(
                [
                    _f("id", S),
                    _f("username", S),
                    _f("edge_followed_by", T.StructType([_f("count", L)])),
                    _f("edge_owner_to_timeline_media", T.StructType([_f("count", L)])),
                ]
            ),
        ),
    ]
)

# comments side table (`js_to_comment_table`, `InstagramPostScraper.py:263-267`)
COMMENTS = T.StructType(
    [
        _f("post_id", S),
        _f("post_shortcode", S),
        _f("comment_count", L),
        _f("parent_comment_id", S),  # null for top-level
        _f("comment_id", S),
        _f("owner", S),
        _f("likes", L),
        _f("text", S),
    ]
)

# post→image link table (`create_image_df`, `InstagramPostScraper.py:359`)
POST_IMAGES = T.StructType(
    [
        _f("shortcode", S),
        _f("owner_username", S),
        _f("timestamp", TS),
        _f("image", S),
    ]
)

# CrowdTangle flattened posts (`CTExtractors.py:30-46`,
# `Preprocessor.py:41-54`; FIXTURES.md §6)
CT_POSTS = T.StructType(
    [
        _f("platformId", S, False),
        _f("platform", S),
        _f("date", TS),
        _f("type", S),
        _f("description", S),
        _f(
            "account",
            T.StructType(
                [
                    _f("id", L),
                    _f("name", S),
                    _f("handle", S),
                    _f("subscriberCount", L),
                    _f("url", S),
                    _f("platform", S),
                    _f("platformId", S),
                    _f("verified", B),
                ]
            ),
        ),
        _f(
            "statistics",
            T.StructType(
                [
                    _f(
                        "actual",
                        T.StructType([_f("favoriteCount", L), _f("commentCount", L)]),
                    ),
                    _f(
                        "expected",
                        T.StructType([_f("favoriteCount", L), _f("commentCount", L)]),
                    ),
                ]
            ),
        ),
        _f("score", D),
        _f("postUrl", S),
        _f("id", S),
        _f("subscriberCount", L),
    ]
)

# image-labels table (`ImageLabeler.py:153-167`; FIXTURES.md §7)
IMAGE_LABELS = T.StructType(
    [
        _f("image", S),
        _f(
            "predictions",
            T.ArrayType(T.StructType([_f("category", S), _f("confidence", D)])),
        ),
        _f("category", S),
    ]
)

SCENE_HIERARCHY = T.StructType([_f("category", S), _f("level1", S), _f("level2", S)])

# feature-vector table (`DIRAdapter.py` output; FIXTURES.md §8)
IMAGE_FEATURES = T.StructType([_f("image", S), _f("feature", T.ArrayType(T.FloatType()))])

# scrape-state table (`InstagramImageScraper.py:62-69`; FIXTURES.md §9)
SCRAPE_STATE = T.StructType(
    [
        _f("post_id", S),
        _f("image_scraped", T.IntegerType()),
        _f("image_attempts", T.IntegerType()),
        _f("max_attempts", T.IntegerType()),
        _f("shortcode", S),
        _f("image_url", S),
    ]
)
