"""Schema-ful JSON flattening: raw post documents → metadata / comments /
image-link tables (SURVEY.md F7, E10-E13, J5; §7.1 M3).

Reference: `InstagramPostScraper.py:287-348` flattens each post dict
row-at-a-time on the driver; `261-285` builds the comments table with a
Python loop over parent + threaded edges. Here the same shapes are pure
DataFrame expressions over a schema-declared `spark.read.json` — the
flattening distributes, and Catalyst prunes unread JSON branches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from social_media_data_pipeline_spark import schemas


def read_post_json(spark: SparkSession, path: str) -> DataFrame:
    """S3: read every post document in a folder (multiLine JSON docs)."""
    return spark.read.schema(schemas.POST_JSON).option("multiLine", True).json(path)


def flatten_posts(raw: DataFrame, scrape_name: str = "") -> DataFrame:
    """js_to_flat_dict (`InstagramPostScraper.py:287-348`) as one select.

    Notable mappings: caption = first caption edge else null (E12);
    hashtags regex over caption (E7); comments_flat = parent text
    followed by its threaded texts, in edge order (flatten of nested
    transform); album_images only for sidecars (missing struct → null →
    empty array).
    """
    # try_element_at: empty edges array → null caption (ANSI-safe E12)
    caption = (
        F.try_element_at(F.col("edge_media_to_caption.edges"), F.lit(1))
        .getField("node")
        .getField("text")
    )
    parent_edges = F.col("edge_media_to_parent_comment.edges")
    comments_flat = F.flatten(
        F.transform(
            parent_edges,
            lambda e: F.concat(
                F.array(e.getField("node").getField("text")),
                F.coalesce(
                    F.transform(
                        e.getField("node").getField("edge_threaded_comments").getField("edges"),
                        lambda t: t.getField("node").getField("text"),
                    ),
                    F.array().cast("array<string>"),
                ),
            ),
        )
    )
    album = F.transform(
        F.col("edge_sidecar_to_children.edges"),
        lambda e: F.concat_ws(
            "_", e.getField("node").getField("id"), e.getField("node").getField("shortcode")
        ),
    )
    out = raw.select(
        F.col("id"),
        F.col("shortcode"),
        F.lit(scrape_name).alias("source"),
        F.format_string("https://www.instagram.com/p/%s/", F.col("shortcode")).alias("post_url"),
        F.col("display_url"),
        F.col("accessibility_caption"),
        F.col("is_video"),
        F.transform(
            F.col("edge_media_to_tagged_user.edges"),
            lambda e: e.getField("node").getField("user").getField("username"),
        ).alias("tagged_users"),
        caption.alias("caption"),
        F.coalesce(
            F.regexp_extract_all(caption, F.lit(r"#(\w+)"), F.lit(1)),
            F.array().cast("array<string>"),
        ).alias("hashtags"),
        F.col("caption_is_edited"),
        F.col("has_ranked_comments"),
        F.col("like_and_view_counts_disabled"),
        F.col("edge_media_preview_like.count").alias("likes"),
        F.col("edge_media_to_parent_comment.count").alias("comment_count"),
        F.coalesce(comments_flat, F.array().cast("array<string>")).alias("comments_flat"),
        F.col("comments_disabled"),
        F.timestamp_seconds(F.col("taken_at_timestamp")).alias("timestamp"),
        F.col("is_affiliate"),
        F.col("is_paid_partnership"),
        F.col("location.name").alias("location"),
        F.col("owner.id").alias("owner_id"),
        F.col("owner.username").alias("owner_username"),
        F.col("owner.edge_followed_by.count").alias("owner_followercount"),
        F.col("owner.edge_owner_to_timeline_media.count").alias("owner_posts"),
        F.col("is_ad"),
        F.coalesce(album, F.array().cast("array<string>")).alias("album_images"),
    )
    return out.orderBy("timestamp")  # `InstagramPostScraper.py:383` (O1)


def flatten_minimal(posts_flat: DataFrame) -> DataFrame:
    """The 7-column "minimal" table (`InstagramPostScraper.py:391-396`):
    P2 projection + E13 newline-join of comments."""
    return posts_flat.select(
        "display_url",
        "post_url",
        "timestamp",
        "likes",
        "comment_count",
        "caption",
        F.array_join(F.col("comments_flat"), "\n").alias("comments"),
    )


def extract_comments(raw: DataFrame) -> DataFrame:
    """js_to_comment_table (`InstagramPostScraper.py:261-285`): one row
    per parent comment, then one per threaded child carrying the
    parent's id — two exploded branches, unioned.

    The reference's KeyError-swallow for missing `edge_threaded_comments`
    (`:278-283`) becomes a null-safe coalesce.
    """
    base = raw.select(
        F.col("id").alias("post_id"),
        F.col("shortcode").alias("post_shortcode"),
        F.col("edge_media_to_parent_comment.count").alias("comment_count"),
        F.explode(F.col("edge_media_to_parent_comment.edges")).alias("edge"),
    ).select(
        "post_id",
        "post_shortcode",
        "comment_count",
        F.col("edge.node").alias("parent"),
    )
    parents = base.select(
        "post_id",
        "post_shortcode",
        "comment_count",
        F.lit(None).cast("string").alias("parent_comment_id"),
        F.col("parent.id").alias("comment_id"),
        F.col("parent.owner.username").alias("owner"),
        F.col("parent.edge_liked_by.count").alias("likes"),
        F.col("parent.text").alias("text"),
    )
    children = base.select(
        "post_id",
        "post_shortcode",
        "comment_count",
        F.col("parent.id").alias("parent_comment_id"),
        # explode(null) emits no rows — exactly the reference's
        # KeyError-swallow for posts without threaded comments
        F.explode(F.col("parent.edge_threaded_comments.edges")).alias("t"),
    ).select(
        "post_id",
        "post_shortcode",
        "comment_count",
        "parent_comment_id",
        F.col("t.node.id").alias("comment_id"),
        F.col("t.node.owner.username").alias("owner"),
        F.col("t.node.edge_liked_by.count").alias("likes"),
        F.col("t.node.text").alias("text"),
    )
    return parents.unionByName(children)


def image_link_table(posts_flat: DataFrame, listing: DataFrame) -> DataFrame:
    """create_image_df (`InstagramPostScraper.py:350-359`): main image +
    album members per post, kept only if present in the binary listing
    (J5 fan-out + existence semi-join)."""
    exploded = posts_flat.select(
        "shortcode",
        "owner_username",
        "timestamp",
        F.explode(
            F.concat(
                F.array(F.concat_ws("_", F.col("id"), F.col("shortcode"))),
                F.col("album_images"),
            )
        ).alias("image_base"),
    ).withColumn("image", F.concat(F.col("image_base"), F.lit(".jpg")))
    return exploded.join(
        listing.select("image").dropDuplicates(["image"]), "image", "left_semi"
    ).select("shortcode", "owner_username", "timestamp", "image")
